package graft.queries

/** Scratch store builds shared across the gate/bench queries that
  * probe the same persisted artifact over the same data dir
  * (q117/q122/q124/q126/q129/q132-q135/q143): the FIRST query of a
  * run pays the write — that run IS the store-lifecycle proof (write
  * → commit → serve in one query) — and later queries and bench
  * passes probe the committed version only, exactly like a
  * production re-query (round-11 verdict item 7: one build per pass
  * instead of one per query, with identical result rows). Keyed by
  * (kind, data dir) so different scale factors never share;
  * [[graft.tools.Scratch]] dirs clean up at JVM exit.
  *
  * `computeIfAbsent` (not a lazy map insert-after-build): the store
  * writers are single-writer protocols, so a second caller of the
  * same key must BLOCK until the first build commits rather than
  * racing a concurrent write onto the same path. */
private[queries] object StoreOnce {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** The committed store path for `kind` over `d`, building it via
    * `build` exactly once per JVM; concurrent callers of the same
    * key wait for the one build. */
  def dir(kind: String, d: String)(build: String => Unit): String =
    cache.computeIfAbsent((kind, d), _ => {
      val p = graft.tools.Scratch.dir(s"graft_$kind")
      build(p)
      p
    })
}
