package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named materialized relations: build once per (session, input dir,
  * name), reuse everywhere. The graph family all projects the same
  * derived relations (the distinct customer×supplier bipartite pairs;
  * the top-3000 co-sale edge list) — without a shared handle each
  * consumer re-executes the orders⨝lineitem projection + pair
  * aggregation, which is pure waste: in production such a projection is
  * owned once (a bucketed table or a cached view) and every downstream
  * graph/score query reads it.
  *
  * Implementation: a session-scoped, LRU-BOUNDED registry of
  * `localCheckpoint`ed DataFrames. localCheckpoint both materializes
  * (executor-local storage, MEMORY_AND_DISK) and truncates lineage, so N
  * consumers cost one derivation plus N metadata-cheap scans, and
  * iterative consumers (pagerank, k-core) don't drag the projection's
  * lineage through every round.
  *
  * Bounding: the registry holds at most [[maxEntries]] relations in
  * least-recently-USED order (a long-lived session registering many
  * (dir, name) pairs — every scale factor a test JVM touches — must not
  * pin unbounded executor storage). Eviction simply drops the reference:
  * the checkpointed blocks are released by Spark's ContextCleaner once
  * unreachable, and a consumer that asks again later rebuilds
  * transparently through the same `of` call — correctness never depends
  * on residency, only cost does.
  *
  * At warehouse scale the same seam is owned by a bucketed table:
  * [[ofBucketed]] writes the relation ONCE through
  * [[Bucketing.writeBucketed]] (pre-shuffled on its join key) and serves
  * every subsequent request as a catalog read-back — surviving the
  * session, and giving downstream joins on the bucket key their
  * zero-exchange plan. The registry keeps the library behavior identical
  * either way.
  *
  * Keys include the session identity (checkpointed RDDs die with their
  * session) and the input directory (one JVM may query several scale
  * factors — the test suites do).
  */
object Materialized {

  /** Max resident relations; the eldest-by-last-use is dropped beyond
    * this. Sized to the working set of one composed pipeline (the full
    * query registry's shared projections fit in single digits) with
    * headroom for several scale factors resident at once.
    */
  val maxEntries = 32

  private val cache =
    new java.util.LinkedHashMap[(Int, String, String), DataFrame](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, String, String), DataFrame]): Boolean =
        size() > maxEntries
    }

  /** The relation registered under (session, dir, name), building and
    * checkpointing it on first use. Rebuilds transparently if the entry
    * was evicted since.
    */
  def of(s: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val k = (System.identityHashCode(s), dir, name)
    val hit = cache.synchronized(cache.get(k))
    if (hit != null) hit
    else {
      // Build OUTSIDE the lock — localCheckpoint runs a Spark job, and a
      // global lock around it would serialize unrelated builders (and a
      // nested of() inside a build would contend). A racing duplicate
      // build is benign: one result wins the registry, the loser's
      // blocks are collected once unreachable.
      val built = build.localCheckpoint() // stats-ok: one-shot cache-entry build
      cache.synchronized {
        val raced = cache.get(k)
        if (raced != null) raced
        else { cache.put(k, built); built }
      }
    }
  }

  /** Content-keyed variant of [[of]]: the cache key is (session, stage,
    * the CANONICALIZED OPTIMIZED PLAN of the input relation) instead of
    * a caller-chosen name string. This is the memoization seam the SQL
    * TVF routes share with the Dataset routes: a TVF receives a VIEW
    * NAME, and keying a materialization on that name would tie
    * correctness to registry residency (redefine the view → a stale
    * handle serves the OLD contents). Keying on the resolved input's
    * canonical plan dissolves that: a redefined view resolves to a
    * different plan and misses; the same relation reached through ANY
    * name — or through no name at all — hits. Plan equality is the same
    * `sameResult` contract Spark's own CacheManager matches cached
    * relations with: equal canonical plans ⇒ equal results, and a
    * semantically-equal-but-structurally-different derivation merely
    * rebuilds (a cost, never a correctness, miss).
    *
    * The derivation stays OUTSIDE the key on purpose — operators with
    * internal iterative checkpoints (minhashLshPairs, dedupClusters)
    * embed fresh LogicalRDDs per invocation, so their own plans never
    * canonicalize equal across calls; the INPUT scan plan does.
    * `stage` names the derivation applied on top (include its
    * parameters — e.g. "lsh_pairs:doc_id:text").
    */
  def ofContent(input: DataFrame, stage: String)
      (build: DataFrame => DataFrame): DataFrame = {
    val s = input.sparkSession
    val canon = input.queryExecution.optimizedPlan.canonicalized
    val k = (System.identityHashCode(s), stage, canon.hashCode())
    // Session match is REFERENCE equality, not the identity hash in the
    // key: identity hashes are not unique (two live sessions can share
    // one), and serving a checkpointed DataFrame across sessions would
    // bind a caller to another session's SparkContext. The entry pins
    // the owning session strongly — the cached DataFrame references it
    // anyway, so this adds no retention the value didn't already have.
    def matches(e: (SparkSession, Any, DataFrame)): Boolean =
      (e._1 eq s) && e._2 == canon
    val hit = contentCache.synchronized {
      Option(contentCache.get(k)).flatMap(_.find(matches)).map(_._3)
    }
    hit.getOrElse {
      val built = build(input).localCheckpoint() // stats-ok: one-shot cache-entry build
      contentCache.synchronized {
        val cur = Option(contentCache.get(k))
          .getOrElse(List.empty[(SparkSession, Any, DataFrame)])
        cur.find(matches).map(_._3).getOrElse {
          contentCache.put(k, (s, canon, built) :: cur)
          built
        }
      }
    }
  }

  private val contentCache =
    new java.util.LinkedHashMap[
        (Int, String, Int), List[(SparkSession, Any, DataFrame)]](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[
            (Int, String, Int), List[(SparkSession, Any, DataFrame)]])
          : Boolean = size() > maxEntries
    }

  /** The production seam: the relation as a bucketed+sorted MANAGED
    * TABLE named `table`, written once via [[Bucketing.writeBucketed]]
    * (one ingest-time shuffle on `key`) and read back from the catalog
    * on every call after — downstream joins/aggregations on `key` plan
    * with zero exchanges on this side, and the materialization survives
    * the session (unlike [[of]]'s checkpoint blocks).
    *
    * Concurrency and staleness: the check-then-write is serialized per
    * table name (two concurrent first callers would otherwise race into
    * duplicate saveAsTable jobs — the second waits, then reads the
    * winner's table), and an ALREADY-EXISTING table is validated against
    * the requested bucket spec — a table bucketed on a different key or
    * count would silently hand downstream joins a plan WITH exchanges
    * while the caller believes it owns the zero-exchange seam, so a
    * mismatch fails loudly instead.
    *
    * SCOPE: the serialization is per JVM — the lock map lives in this
    * process, so two DRIVERS sharing one metastore can still race
    * duplicate saveAsTable jobs. For multi-driver deployments the
    * catalog is the arbiter: the loser's saveAsTable throws
    * TableAlreadyExistsException, which callers should treat as "the
    * winner's table is ready" and re-call this method (the bucket-spec
    * validation below then vets the winner's table exactly as if this
    * JVM had written it). Lock entries are retained for the process
    * lifetime — bounded by the number of DISTINCT materialized table
    * names, a deliberate leak the size of a string per seam.
    */
  def ofBucketed(s: SparkSession, table: String, key: String, buckets: Int)
      (build: => DataFrame): DataFrame = {
    val lock = tableLocks.computeIfAbsent(table, _ => new Object)
    lock.synchronized {
      if (!s.catalog.tableExists(table)) {
        // A previous PROCESS may have left the managed location behind:
        // with the in-memory catalog the metadata dies with the JVM but
        // the warehouse files do not, and CTAS validates the location is
        // empty. The relation is write-once-DETERMINISTIC by this seam's
        // contract, so clearing the orphan and rebuilding is
        // byte-equivalent — never data loss. (Within one JVM the catalog
        // hit above short-circuits before this path.)
        val ident = s.sessionState.sqlParser.parseTableIdentifier(table)
        val loc = new org.apache.hadoop.fs.Path(
          s.sessionState.catalog.defaultTablePath(ident))
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        Bucketing.writeBucketed(build, table, key, buckets)
      }
    }
    val ident = s.sessionState.sqlParser.parseTableIdentifier(table)
    val spec = s.sessionState.catalog.getTableMetadata(ident).bucketSpec
    require(
      spec.exists(b =>
        b.numBuckets == buckets && b.bucketColumnNames == Seq(key)),
      s"table $table exists with bucket spec ${spec.orNull}, but " +
        s"(key=$key, buckets=$buckets) was requested — refusing to serve " +
        "a differently-bucketed relation as the co-location seam")
    s.table(table)
  }

  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Number of resident relations (diagnostics/tests). */
  def size: Int = cache.synchronized(cache.size())

  /** Number of resident content-keyed relations (diagnostics/tests). */
  def contentSize: Int = contentCache.synchronized(contentCache.size())

  /** Drop every cached relation (tests / memory pressure). The backing
    * checkpoint blocks are released by Spark's ContextCleaner once the
    * DataFrames are unreachable.
    */
  def clear(): Unit = {
    cache.synchronized(cache.clear())
    contentCache.synchronized(contentCache.clear())
  }
}
