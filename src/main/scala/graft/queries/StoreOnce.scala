package graft.queries

/** Scratch store builds shared across the gate/bench queries that
  * probe the same persisted artifact over the same data dir
  * (q117/q122/q124/q126/q129): the FIRST query of a run pays the
  * write — that run IS the store-lifecycle proof (write → commit →
  * serve in one query) — and later queries and bench passes probe the
  * committed version only, exactly like a production re-query
  * (round-11 verdict item 7: one build per pass instead of one per
  * query, with identical result rows). Keyed by (kind, data dir) so
  * different scale factors never share; [[graft.tools.Scratch]] dirs
  * clean up at JVM exit. */
private[queries] object StoreOnce {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** The committed store path for `kind` over `d`, building it via
    * `build` exactly once per JVM. */
  def dir(kind: String, d: String)(build: String => Unit): String =
    cache.getOrElseUpdate((kind, d), {
      val p = graft.tools.Scratch.dir(s"graft_$kind")
      build(p)
      p
    })
}
