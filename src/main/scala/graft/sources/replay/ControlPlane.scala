package graft.sources.replay

/** Stream-topology discovery against a control-plane service — the seam
  * that makes resharding RUNTIME-DISCOVERED instead of user-scripted.
  *
  * The reference learns about shard end/split/merge from the service's
  * metadata whenever the worker polls it
  * (/root/reference/src/main/scala/px/kinesis/stream/consumer/RecordProcessorImpl.scala:102-113);
  * the user never configures a reshard. With `controlPlaneUrl` set, this
  * source does the same: topology (shard count + any announced reshard
  * instant) comes from `GET <url>` at stream construction and is re-polled
  * once per trigger until a reshard is announced, at which point the
  * instant is pinned into the offset log (the v2 `"at"` field) — so
  * restarts revalidate what was DISCOVERED exactly as they validate what
  * was configured, and a service answer that contradicts the checkpoint
  * is rejected, not silently remapped.
  *
  * Wire format: `key=value` lines (`numShards`, optional `reshardAtMs` /
  * `mergeAtMs`), comments with `#`. Deliberately minimal — the contract
  * under test is the DISCOVERY seam and its interaction with offsets,
  * not a marshalling layer. In this zero-egress environment the service
  * is a loopback `com.sun.net.httpserver` started by the test harness;
  * a production provider would point the same option at real stream
  * metadata.
  */
object ControlPlane {

  final case class Topology(
      numShards: Int,
      reshardAtMs: Option[Long],
      mergeAtMs: Option[Long],
      counts: Option[IndexedSeq[Long]] = None) {
    require(numShards >= 1, s"control plane reported numShards=$numShards")
    require(reshardAtMs.isEmpty || mergeAtMs.isEmpty,
      "control plane announced both a split and a merge")
    def announced: Boolean = reshardAtMs.isDefined || mergeAtMs.isDefined
  }

  /** One wire record from the data plane — the fields the envelope needs:
    * user-record position within its shard (the sequence domain), arrival
    * micros, partition key, payload bytes.
    */
  final case class WireRecord(
      pos: Long, tsMicros: Long, key: String, payload: Array[Byte])

  /** Fetch and parse the topology. Failures throw — a stream that cannot
    * see its control plane must fail its trigger (and let the engine
    * retry), not guess a topology: planning against a stale shard map is
    * exactly the silent-replay/loss class the offset validation exists
    * to prevent.
    */
  def fetch(url: String): Topology = {
    val conn = new java.net.URI(url).toURL.openConnection()
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    val in = conn.getInputStream
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    parse(text)
  }

  private[replay] def parse(text: String): Topology = {
    val kv = text.linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap
    Topology(
      numShards = kv.getOrElse("numShards",
        sys.error(s"control plane answer lacks numShards: $text")).toInt,
      reshardAtMs = kv.get("reshardAtMs").map(_.toLong),
      mergeAtMs = kv.get("mergeAtMs").map(_.toLong),
      counts = kv.get("counts").map(
        _.split(",").iterator.map(_.trim.toLong).toIndexedSeq))
  }

  /** Fetch one page of a shard's user records: positions
    * [from, min(to, from + limit)) — the GetRecords shape (bounded pages,
    * resumed by position). Executor-side, no driver involvement. Lines:
    * `pos \t tsMicros \t key \t base64(payload)`.
    */
  def fetchRecords(dataPlaneUrl: String, shard: Int, from: Long, to: Long,
      limit: Int): Seq[WireRecord] = {
    val conn = new java.net.URI(
      s"$dataPlaneUrl?shard=$shard&from=$from&to=$to&limit=$limit")
      .toURL.openConnection()
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(15000)
    val in = conn.getInputStream
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { l =>
      val f = l.split("\t", 4)
      require(f.length == 4, s"malformed data-plane record line: $l")
      WireRecord(f(0).toLong, f(1).toLong, f(2),
        java.util.Base64.getDecoder.decode(f(3)))
    }.toSeq
  }

  /** The first position in `shard` whose record timestamp is at or after
    * `atMicros` — the GetShardIterator(AT_TIMESTAMP) shape: one bounded
    * driver-side call per shard at stream initialization, so an
    * `at_timestamp` start needs no local shard scan. Answer:
    * `position=p`.
    */
  def fetchTimestampPosition(dataPlaneUrl: String, shard: Int,
      atMicros: Long): Long = {
    val conn = new java.net.URI(
      s"$dataPlaneUrl?shard=$shard&atMicros=$atMicros")
      .toURL.openConnection()
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    val in = conn.getInputStream
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val line = text.linesIterator.map(_.trim)
      .find(_.startsWith("position=")).getOrElse(
        sys.error(s"timestamp-scan answer lacks a position= line: $text"))
    line.stripPrefix("position=").trim.toLong
  }

  /** A worker's lease: the shard subset it owns, plus HANDOFF FLOORS for
    * shards acquired mid-stream — the first position this worker may
    * read, i.e. the PREVIOUS owner's last committed checkpoint, served
    * by the lease table itself (KCL's DynamoDB lease row stores both the
    * owner and the checkpoint sequence number — ownership and progress
    * travel together, which is exactly what makes a rebalance
    * exactly-once).
    *
    * A floor naming a shard OUTSIDE the assignment is tolerated and
    * dropped (see [[Lease.apply]]): leases are re-fetched every
    * trigger, and during a handoff the lease table's `pos.` lines can
    * be momentarily visible before/after the `shards=` line updates —
    * failing the whole streaming query over a one-trigger inconsistency
    * trades liveness for nothing (the floor only matters once the shard
    * IS assigned, and then it is present again). Dropped entries are
    * logged to stderr for the operator.
    */
  final case class Lease private (shards: Set[Int], floors: Map[Int, Long]) {
    /** The case-class-synthesized copy would bypass the stray-floor
      * filter (ADVICE r8); defining it explicitly routes EVERY
      * construction path through the validated companion apply.
      */
    def copy(shards: Set[Int] = shards,
        floors: Map[Int, Long] = floors): Lease = Lease(shards, floors)
  }

  object Lease {
    def apply(shards: Set[Int], floors: Map[Int, Long]): Lease = {
      val stray = floors.keySet.diff(shards)
      if (stray.nonEmpty)
        System.err.println(
          s"[graft] lease floors for unassigned shards $stray dropped " +
            s"(assignment $shards) — transient handoff inconsistency")
      new Lease(shards, floors -- stray)
    }
  }

  /** Fetch this worker's lease assignment: the shard subset it owns —
    * the consumer-group seam (KCL's DynamoDB lease table,
    * StreamScheduler.scala:61-97). Answer: `shards=0,2,...`, plus an
    * optional `pos.<shard>=<position>` line per shard acquired from
    * another worker (its last committed position — see [[Lease]]).
    * Assignments must be DISJOINT across workers at every instant; a
    * REASSIGNMENT between triggers is supported, provided the service
    * publishes the new owner's floors only after the old owner's final
    * commit (the reference worker's leaseLost → shutdown-at-checkpoint
    * handshake, RecordProcessorImpl.scala:90-100).
    */
  def fetchLease(url: String): Lease = {
    val conn = new java.net.URI(url).toURL.openConnection()
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    val in = conn.getInputStream
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val lines = text.linesIterator.map(_.trim).toSeq
    val line = lines.find(_.startsWith("shards=")).getOrElse(
      sys.error(s"lease answer lacks a shards= line: $text"))
    val body = line.stripPrefix("shards=").trim
    val shards =
      if (body.isEmpty) Set.empty[Int]
      else body.split(",").iterator.map(_.trim.toInt).toSet
    val floors = lines.filter(_.startsWith("pos.")).map { l =>
      l.split("=", 2) match {
        case Array(k, v) => k.stripPrefix("pos.").trim.toInt -> v.trim.toLong
        case _ => sys.error(s"malformed lease floor line: $l")
      }
    }.toMap
    Lease(shards, floors)
  }
}
