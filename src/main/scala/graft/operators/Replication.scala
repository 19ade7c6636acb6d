package graft.operators

import java.time.{Duration, Instant}

import org.apache.spark.sql.SparkSession

import graft.sinks.Properties

/** Replication driver — the Spark-side port of
  * `scripts/osm2pgsql-replication` (reference: init `:404-475`, update
  * `:477-600`, state handling `:145-215`): determines where to start
  * replaying OSM diffs, then repeatedly fetches the next chunk from a
  * replication source and applies it through a caller-supplied append
  * pipeline, persisting `(base_url, sequence, timestamp)` into the
  * properties store after every successful chunk (crash-safe: a failed
  * apply leaves the state untouched, so the next run redownloads and
  * reapplies — same guarantee as the reference).
  *
  * The replication-directory layout is the standard OSM one: sequence
  * NNNNNNNNN maps to `NNN/NNN/NNN.osc.gz` + `.state.txt`, with the
  * server head state in `state.txt` at the root. Sources are
  * pluggable; [[DirSource]] reads a local mirror (this build runs
  * zero-egress — an HTTP source implements the same two methods).
  */
object Replication {

  final case class State(sequence: Long, timestamp: Instant)

  /** state.txt codec (osmosis format: `sequenceNumber=`, `timestamp=`
    * with backslash-escaped colons, `#` comments). */
  object State {
    def parse(text: String): Option[State] = {
      val kv = text.linesIterator
        .map(_.trim)
        .filterNot(l => l.isEmpty || l.startsWith("#"))
        .flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) => Some(k.trim -> v.trim.replace("\\:", ":"))
            case _           => None
          }
        }
        .toMap
      for {
        seq <- kv.get("sequenceNumber").flatMap(_.toLongOption)
        ts <- kv.get("timestamp").flatMap(s =>
          scala.util.Try(Instant.parse(s)).toOption)
      } yield State(seq, ts)
    }

    def format(s: State): String =
      s"""sequenceNumber=${s.sequence}
         |timestamp=${s.timestamp.toString.replace(":", "\\:")}
         |""".stripMargin
  }

  /** `NNN/NNN/NNN` path fragment for a sequence number. */
  def sequencePath(seq: Long): String =
    f"${seq / 1000000}%03d/${(seq / 1000) % 1000}%03d/${seq % 1000}%03d"

  /** A replication endpoint: head state, per-sequence state, diff
    * payload. */
  trait Source {
    /** head state (`state.txt`) or per-sequence state. */
    def stateInfo(seq: Option[Long] = None): Option[State]
    /** the `.osc.gz`/`.osc` diff for one sequence, as a local path. */
    def diffPath(seq: Long): Option[String]
  }

  /** Local replication mirror with the standard layout. */
  final case class DirSource(baseDir: String) extends Source {
    private def read(p: java.nio.file.Path): Option[String] =
      if (java.nio.file.Files.exists(p))
        Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      else None

    def stateInfo(seq: Option[Long]): Option[State] = {
      val p = seq match {
        case Some(s) => java.nio.file.Paths.get(baseDir,
          sequencePath(s) + ".state.txt")
        case None => java.nio.file.Paths.get(baseDir, "state.txt")
      }
      read(p).flatMap(State.parse)
    }

    def diffPath(seq: Long): Option[String] =
      Seq(".osc.gz", ".osc").iterator
        .map(ext => java.nio.file.Paths.get(baseDir, sequencePath(seq) + ext))
        .find(java.nio.file.Files.exists(_))
        .map(_.toString)
  }

  /** timestamp → first sequence whose state timestamp is >= `date`,
    * by bisection over per-sequence state files (pyosmium
    * timestamp_to_sequence semantics: the sequence to START applying
    * from so no change after `date` is missed). */
  def timestampToSequence(source: Source, date: Instant): Option[Long] = {
    val head = source.stateInfo(None).getOrElse(return None)
    if (!head.timestamp.isAfter(date)) return Some(head.sequence)
    var lo = 0L
    var hi = head.sequence
    // invariant: state(hi).timestamp > date; find lowest such hi
    while (lo < hi) {
      val mid = (lo + hi) / 2
      source.stateInfo(Some(mid)) match {
        case Some(s) if s.timestamp.isAfter(date) => hi = mid
        case Some(_)                              => lo = mid + 1
        case None                                 => lo = mid + 1 // gap: move up
      }
    }
    // start one earlier so the boundary diff is included (the reference
    // rolls back the start date for the same reason)
    Some(math.max(0L, hi - 1))
  }

  // properties keys (src/osm2pgsql.cpp:102-145)
  private val KeyBase = "replication_base_url"
  private val KeySeq = "replication_sequence_number"
  private val KeyTs = "replication_timestamp"

  /** `init`: decide (base_url, sequence, date) and persist it.
    *  - explicit `startAt` date → resolve its sequence on the server;
    *  - import-recorded replication info in the properties → use it;
    *  - otherwise fall back to the db `current_timestamp` minus a
    *    `rollbackMinutes` safety window (default 180 = the reference's
    *    3 hours), resolving the sequence from the date.
    */
  def init(spark: SparkSession, propsPath: String, source: Source,
      baseUrl: String, startAt: Option[Instant] = None,
      rollbackMinutes: Long = 180): State = {
    val stored = scala.util.Try(Properties.load(spark, propsPath))
      .getOrElse(Map.empty[String, String])

    val (seqOpt, date) = startAt match {
      case Some(d) => (None, Some(d))
      case None =>
        (stored.get(KeySeq).flatMap(_.toLongOption),
          stored.get(KeyTs).map(Instant.parse).orElse(
            stored.get("current_timestamp").map(Instant.parse)
              .map(_.minus(Duration.ofMinutes(rollbackMinutes)))))
    }

    val seq = seqOpt.orElse(date.flatMap(timestampToSequence(source, _)))
      .getOrElse(throw new IllegalStateException(
        s"cannot determine start sequence for '$baseUrl' — " +
          "no stored replication info and no --start-at date"))

    val state = source.stateInfo(Some(seq)).getOrElse(
      throw new IllegalStateException(
        s"cannot load state information for $seq from '$baseUrl'"))
    val effDate = date.getOrElse(state.timestamp)
    if (date.isDefined && state.timestamp.isAfter(date.get))
      throw new IllegalStateException(
        s"replication service has no diffs for the requested date: " +
          s"oldest available ${state.timestamp}, requested ${date.get}")

    Properties.save(spark, propsPath, stored ++ Map(
      KeyBase -> baseUrl, KeySeq -> seq.toString,
      KeyTs -> effDate.toString))
    State(seq, effDate)
  }

  /** `init --osm-file` (replication_legacy.feature): seed the update
    * loop from the file's OSMHeader osmosis_replication_* fields — the
    * timestamp is required; the sequence comes from the header when
    * present, otherwise it is resolved against the service by
    * timestamp (the reference's flow for files that carry only a
    * timestamp). */
  def initFromOsmFile(spark: SparkSession, propsPath: String,
      osmFile: String, source: Option[Source] = None,
      baseUrlOverride: Option[String] = None): State = {
    val h = graft.sources.OsmPbf.readHeader(osmFile)
    val url = baseUrlOverride.orElse(h.replicationBaseUrl).getOrElse(
      throw new IllegalStateException(
        s"'$osmFile' carries no replication base URL — pass --server"))
    val ts = h.replicationTimestamp.getOrElse(
      throw new IllegalStateException(
        s"'$osmFile' has no replication timestamp in its header"))
    val seq = h.replicationSequence
      .orElse(source.flatMap(timestampToSequence(_, ts)))
      .getOrElse(throw new IllegalStateException(
        s"cannot determine start sequence for '$osmFile'"))
    val stored = scala.util.Try(Properties.load(spark, propsPath))
      .getOrElse(Map.empty[String, String])
    Properties.save(spark, propsPath, stored ++ Map(
      KeyBase -> url, KeySeq -> seq.toString, KeyTs -> ts.toString))
    State(seq, ts)
  }

  /** `update`: apply every outstanding diff through `applyDiff` (the
    * append pipeline — e.g. ClassicUpdate over an OsmXml-read .osc),
    * persisting state after each successful chunk. Returns the final
    * state. `once` applies a single chunk (the reference's `--once`).
    */
  def update(spark: SparkSession, propsPath: String, source: Source,
      applyDiff: String => Unit, once: Boolean = false): State =
    updateBatched(spark, propsPath, source,
      paths => paths.foreach(applyDiff), maxBatchBytes = 0, once = once)

  /** [[update]] with the reference's `--max-diff-size` batching
    * (scripts/osm2pgsql-replication:477-600): consecutive diffs are
    * gathered until their cumulative byte size would exceed
    * `maxBatchBytes`, each batch goes through `applyBatch` as ONE
    * apply (the k-way-merged append run — latest version per id
    * wins, exactly the reference's concatenated-tempfile semantics),
    * and the persisted state advances to the batch's last sequence
    * only after the apply succeeds. `maxBatchBytes <= 0` forces
    * single-diff batches. `once` stops after the first batch.
    * `postBatch` is the `--post-processing` hook: invoked with the
    * batch's (sequence, timestamp) after a successful apply and
    * BEFORE the state save — a throw leaves the replication state
    * untouched, so the next run redownloads and reapplies. */
  def updateBatched(spark: SparkSession, propsPath: String, source: Source,
      applyBatch: Seq[String] => Unit, maxBatchBytes: Long,
      once: Boolean = false,
      postBatch: (Long, Instant) => Unit = (_, _) => ()): State = {
    val stored = Properties.load(spark, propsPath)
    val baseUrl = stored.getOrElse(KeyBase, throw new IllegalStateException(
      "updates not set up correctly — run init first"))
    var seq = stored.get(KeySeq).flatMap(_.toLongOption)
      .getOrElse(throw new IllegalStateException(
        "updates not set up correctly — run init first"))
    var ts = stored.get(KeyTs).map(Instant.parse)
      .getOrElse(throw new IllegalStateException(
        "updates not set up correctly — run init first"))

    val current = source.stateInfo(None).getOrElse(
      throw new IllegalStateException(
        s"cannot reach the configured replication service '$baseUrl'"))
    var continue = seq < current.sequence

    while (continue && seq < current.sequence) {
      // gather the next batch: at least one diff, then keep adding
      // while the cumulative size stays within the cap
      val batch = Seq.newBuilder[(Long, String)]
      var n = seq
      var bytes = 0L
      var taken = 0
      var gathering = true
      while (gathering && n < current.sequence) {
        source.diffPath(n + 1) match {
          case Some(path) =>
            val sz = math.max(0L, new java.io.File(path).length())
            if (taken > 0 && bytes + sz > maxBatchBytes) gathering = false
            else {
              batch += ((n + 1) -> path); bytes += sz; taken += 1; n += 1
            }
          case None => gathering = false // gap/no new diffs: stop here
        }
      }
      val b = batch.result()
      if (b.isEmpty) continue = false
      else {
        applyBatch(b.map(_._2)) // throws on failure -> state NOT advanced
        seq = b.last._1
        ts = source.stateInfo(Some(seq)).map(_.timestamp).getOrElse(ts)
        postBatch(seq, ts) // --post-processing: throws -> state untouched
        // merge into a FRESH load: applyBatch may have written other
        // keys (import stats, current_timestamp) to the same store —
        // the entry-time `stored` snapshot would silently revert them
        Properties.save(spark, propsPath,
          Properties.load(spark, propsPath) ++ Map(
            KeyBase -> baseUrl, KeySeq -> seq.toString,
            KeyTs -> ts.toString))
        if (once) continue = false
      }
    }
    State(seq, ts)
  }
}
