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
  * Concurrency: the store writers are single-writer protocols, so a
  * second caller of the same key must BLOCK until the first build
  * commits rather than racing a concurrent write onto the same path
  * — but the Spark build itself must NOT run under the map's bin
  * lock (a minutes-long build there would stall unrelated keys that
  * hash to the same bin, and a build that transitively asked for
  * another key could throw `recursive update`). So `computeIfAbsent`
  * only inserts a cheap per-key holder; the build runs under the
  * HOLDER's own lazy-initialization lock, outside the map. A build
  * that fails leaves the holder cached and is retried (into a fresh
  * scratch dir) on the next call.
  *
  * Observability: every completed build records its wall-clock ms
  * under its kind ([[buildMillis]]) so [[graft.Bench]] can attribute
  * store-build cost separately from probe cost in the bench record —
  * without this, whichever query happens to run first in a pass
  * absorbs the build time and the per-query numbers drift between
  * rounds for no code reason (round-13 verdict item 5). */
private[graft] object StoreOnce {
  private final class Holder(f: () => String) { lazy val path: String = f() }
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Holder]()
  private val buildMs =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Wall-clock build ms per store kind, for builds completed so far
    * in this JVM (a kind rebuilt for several data dirs sums). */
  def buildMillis: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    buildMs.forEach((k, v) => b += (k -> v))
    b.result()
  }

  /** The committed store path for `kind` over `d`, building it via
    * `build` exactly once per JVM; concurrent callers of the same
    * key wait for the one build, callers of other keys never wait. */
  def dir(kind: String, d: String)(build: String => Unit): String =
    cache.computeIfAbsent((kind, d), _ => new Holder(() => {
      val p = graft.tools.Scratch.dir(s"graft_$kind")
      val t0 = System.nanoTime()
      build(p)
      buildMs.merge(kind, (System.nanoTime() - t0) / 1000000L, _ + _)
      p
    })).path
}
