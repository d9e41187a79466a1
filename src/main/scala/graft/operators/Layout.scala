package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional clustering. Sorting a table by the Z-value of two
  * query dimensions makes parquet row-group min/max statistics selective
  * on BOTH dimensions at once, so scans filtered on either (or both)
  * prune files — the standard lakehouse layout optimization for a 100-TB
  * fact table queried by more than one key.
  *
  * Scale design: the Z-value is pure codegen'd bit arithmetic (five
  * mask-shift spread steps per dimension, no UDF); `zorderBy` lays the
  * table out with `repartitionByRange` over the Z-value (one range
  * exchange driven by sampled bounds — the same machinery as a global
  * sort) followed by an in-partition sort, which is exactly the
  * write-side cost of any clustered layout. Nothing else shuffles.
  */
object Layout {

  /** Morton Z-value of two non-negative dimensions (each < 2^32): bits of
    * `a` on even positions, bits of `b` on odd. Monotone per 2-adic block,
    * so range predicates on either dimension map to Z-ranges.
    */
  def zValue(a: Column, b: Column): Column = {
    def spread(c: Column): Column = {
      val x0 = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
      val x1 = x0.bitwiseOR(shiftleft(x0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val x4 = x3.bitwiseOR(shiftleft(x3, 2)).bitwiseAND(lit(0x3333333333333333L))
      x4.bitwiseOR(shiftleft(x4, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Morton Z-value of THREE non-negative dimensions (each < 2^21): bits
    * interleaved a,b,c,a,b,c,… — the layout key when a fact table is
    * queried by three independent dimensions (e.g. time × customer ×
    * region). 21 bits per dimension fills 63 bits; quantize wider inputs
    * (shift down) first. Same pure codegen'd mask-shift arithmetic as
    * [[zValue]], one more spread step.
    */
  def zValue3(a: Column, b: Column, c: Column): Column = {
    def spread(x0c: Column): Column = {
      val x0 = x0c.cast("long").bitwiseAND(lit(0x1FFFFFL))
      val x1 = x0.bitwiseOR(shiftleft(x0, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
      val x2 = x1.bitwiseOR(shiftleft(x1, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
      val x3 = x2.bitwiseOR(shiftleft(x2, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
      val x4 = x3.bitwiseOR(shiftleft(x3, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
      x4.bitwiseOR(shiftleft(x4, 2)).bitwiseAND(lit(0x1249249249249249L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
      .bitwiseOR(shiftleft(spread(c), 2))
  }

  /** Lay `df` out in Z-order over two dimensions: range-partition by the
    * Z-value (balanced output files via sampled bounds), sort within each
    * partition, keep the original schema. Write the result with any file
    * sink to get two-dimensional min/max pruning.
    */
  def zorderBy(df: DataFrame, colA: String, colB: String,
      numPartitions: Int): DataFrame = {
    val z = zValue(col(colA), col(colB)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Order-16 Hilbert index of two dimensions — the locality-preserving
    * upgrade over [[zValue]] (no Z-seams: adjacent curve positions are
    * always grid neighbors), via the native codegen'd
    * [[graft.functions.HilbertIndex2]] kernel. Inputs masked to 16 bits;
    * quantize wider domains down first (the zValue contract).
    */
  def hilbertValue(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_hilbert2",
      a.cast("long"), b.cast("long"))

  /** Lay `df` out along the Hilbert curve over two dimensions — same
    * range-partition + in-partition sort recipe as [[zorderBy]], better
    * 2-D pruning at the same file count.
    */
  def hilbertBy(df: DataFrame, colA: String, colB: String,
      numPartitions: Int): DataFrame = {
    df.withColumn("__h", hilbertValue(col(colA), col(colB)))
      .repartitionByRange(numPartitions, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }

  /** Compact a table into ~`targetRowsPerFile`-sized output files,
    * optionally sorted within each file — the small-files remediation
    * every long-running 100-TB table needs (thousands of tiny files from
    * incremental appends → scan-planning overhead and dead parquet
    * metadata I/O; a handful of right-sized files → full-rate scans).
    *
    * Scale design: one cheap metadata-ish count (parquet row counts, no
    * data materialization), then ONE round-robin repartition to the
    * computed file count — round-robin (not range/hash) because
    * compaction wants equal SIZES, not clustering; pair with [[zorderBy]]
    * when clustering is also wanted. `sortCols` re-sorts within each
    * output file so row-group min/max stats stay selective after the
    * rewrite. Also sets a `maxRecordsPerFile` guard so a future append
    * through the same writer cannot silently regress into jumbo files.
    */
  def compact(df: DataFrame, path: String, targetRowsPerFile: Long,
      sortCols: Seq[String] = Nil): Long = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val laid0 = df.repartition(files)
    val laid = if (sortCols.nonEmpty)
      laid0.sortWithinPartitions(sortCols.map(col): _*) else laid0
    laid.write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(path)
    files.toLong
  }

  /** Hive-style directory partitioning: write `df` under
    * `path/<col>=<value>/…` so scans filtered on the partition columns
    * prune whole DIRECTORIES at planning time (no file is even listed,
    * let alone read) — the coarsest and cheapest pruning tier of a
    * 100-TB table layout, above [[zorderBy]]'s row-group statistics.
    *
    * The input is repartitioned BY the partition columns first — the
    * standard dynamic-partition-write fix: without it every write task
    * holds an open file per partition value it happens to see, producing
    * tasks × values small files (and as many open parquet writers);
    * with it each partition value's rows land in one task → one file
    * per value (LayoutSpec pins this). Skewed partition values can split
    * the hot value across tasks by adding a salt column to the
    * repartitioning — at the cost of that many files for the hot value.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.repartition(partitionCols.map(col): _*)
      .write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(path)
  }

  /** Idempotent partition-level backfill: overwrite ONLY the partitions
    * present in `df`, leaving every other partition of the table
    * untouched (dynamic partition overwrite — static mode would drop the
    * whole table first). THE re-run primitive for partitioned pipelines:
    * recomputing one bad day and writing it back is safe to repeat, and
    * a crash mid-write never touches partitions outside the batch.
    * Same repartition-first discipline as [[writePartitioned]].
    */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.repartition(partitionCols.map(col): _*)
      .write.partitionBy(partitionCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(path)
  }

  /** Contiguous 0-based row ids in `orderCols` order WITHOUT a single-task
    * global sort. The naive formulation —
    * `row_number().over(Window.orderBy(key))` — plans an Exchange to ONE
    * partition and sorts the entire table in a single task: the most
    * common accidental scale-killer in id-assignment / example-numbering
    * pipelines. This operator does the distributed version: range-
    * partition by the key (sampled bounds, balanced partitions), sort
    * within each partition, then a two-pass prefix sum — pass 1 counts
    * rows per partition (P numbers to the driver, partition METADATA, not
    * data), pass 2 adds each partition's offset to its local index.
    *
    * Ordering among tied keys is partition-internal; pass a unique
    * tie-breaking suffix in `orderCols` (the row_number convention) for a
    * fully deterministic assignment. The input is locally checkpointed so
    * both passes see the identical partitioning and the sort runs once;
    * that is the standard cost of `zipWithIndex`-shaped work (budget
    * MEMORY_AND_DISK for one pass of the table, exactly like any global
    * sort's shuffle files).
    */
  def denseIds(df: DataFrame, orderCols: Seq[String], numPartitions: Int,
      idName: String = "row_id"): DataFrame = {
    require(orderCols.nonEmpty, "denseIds needs ordering columns")
    val sorted = rangeSorted(df, orderCols, numPartitions)
      .localCheckpoint(false) // stats-ok: both passes must see the exact partitions
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    val schema = sorted.schema.add(idName,
      org.apache.spark.sql.types.LongType, nullable = false)
    df.sparkSession.createDataFrame(indexed, schema)
  }

  /** The distributed ordering stage of [[denseIds]], exposed so its plan
    * shape (range exchange, NO single-partition exchange) is pinnable.
    */
  private[graft] def rangeSorted(df: DataFrame, orderCols: Seq[String],
      numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)

  /** Deterministic per-epoch training-order shuffle: a reproducible
    * global permutation of the corpus for epoch `epoch`, positions dense
    * 0..n−1. Training runs need a DIFFERENT order every epoch but the
    * SAME order on re-run, resume, or re-shard — `rand()` gives neither,
    * and `orderBy(rand(seed))` is partitioning-dependent. The draw here
    * is md5(epoch:id) (the engine's standard md5-draw family, shared
    * with splitAssign/weightedSamplePredicate), so the permutation is a
    * pure function of (epoch, id): any engine, cluster size, or retry
    * reproduces it bit-for-bit, and ingest can pre-compute it at write
    * time.
    *
    * Scale design: the draw is map-side codegen'd hashing; the ordering
    * + dense position assignment reuse [[denseIds]] — a range exchange
    * on sampled draw bounds, in-partition sorts, and a two-pass prefix
    * sum whose cross-partition traffic is one count per partition. No
    * single-task sort anywhere (the `Window.orderBy(draw)` formulation
    * the oracle uses funnels the corpus through ONE task).
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
      numPartitions: Int, posName: String = "position"): DataFrame = {
    val draw = md5(concat_ws(":", lit(epoch.toString),
      col(idCol).cast("string")).cast("binary"))
    denseIds(df.withColumn("draw", draw), Seq("draw", idCol),
      numPartitions, posName)
  }

  // ---- q146: deterministic epoch shuffle -------------------------------------
  // Epoch-7 permutation of the documents table; the oracle replays the
  // identical md5 draw and assigns positions with the single-task window
  // form the operator exists to avoid.
  private def q146(s: SparkSession, d: String): DataFrame =
    epochShuffle(Tables.documents(s, d).select(col("doc_id")),
        "doc_id", epoch = 7, numPartitions = 32)
      .orderBy(col("position"))
  private val q146Sql =
    """SELECT doc_id,
         md5(concat_ws(':', '7', doc_id::VARCHAR)) AS draw,
         (row_number() OVER (
           ORDER BY md5(concat_ws(':', '7', doc_id::VARCHAR)), doc_id)
          - 1)::BIGINT AS position
       FROM documents ORDER BY position"""

  // ---- q79: Z-value computation ----------------------------------------------
  // The interleave itself, oracle-checked bit-for-bit over the customer
  // table (c_custkey up to 2^31-safe, c_nationkey small — exercises both
  // sparse-high-bit and dense-low-bit inputs).
  private def q79(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
        zValue(col("c_custkey"), col("c_nationkey")).as("z"))
      .orderBy(col("c_custkey"))
  private val q79Sql =
    """WITH a0 AS (
         SELECT c_custkey, c_nationkey::BIGINT AS c_nationkey,
           c_custkey::BIGINT AS x, c_nationkey::BIGINT AS y
         FROM customer),
       a1 AS (SELECT c_custkey, c_nationkey,
         (x | (x << 16)) & 281470681808895 AS x,
         (y | (y << 16)) & 281470681808895 AS y FROM a0),
       a2 AS (SELECT c_custkey, c_nationkey,
         (x | (x << 8)) & 71777214294589695 AS x,
         (y | (y << 8)) & 71777214294589695 AS y FROM a1),
       a3 AS (SELECT c_custkey, c_nationkey,
         (x | (x << 4)) & 1085102592571150095 AS x,
         (y | (y << 4)) & 1085102592571150095 AS y FROM a2),
       a4 AS (SELECT c_custkey, c_nationkey,
         (x | (x << 2)) & 3689348814741910323 AS x,
         (y | (y << 2)) & 3689348814741910323 AS y FROM a3),
       a5 AS (SELECT c_custkey, c_nationkey,
         (x | (x << 1)) & 6148914691236517205 AS x,
         (y | (y << 1)) & 6148914691236517205 AS y FROM a4)
       SELECT c_custkey, c_nationkey, (x | (y << 1))::BIGINT AS z
       FROM a5 ORDER BY c_custkey"""

  // ---- q395: Hilbert index computation ----------------------------------------
  // Bit-for-bit against the unrolled rot-and-walk oracle over customer
  // (key folded into the 16-bit domain; nationkey exercises the dense
  // low bits — the q79 contract for the better curve).
  private def q395(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        col("c_nationkey").cast("long").as("c_nationkey"),
        hilbertValue(col("c_custkey") % 65536, col("c_nationkey"))
          .as("h"))
      .orderBy(col("c_custkey"))
  private val q395Sql = {
    // one CTE per curve order: (x, y, d) stepped with s = 2^15 … 1; the
    // CASE trio reads the PREVIOUS level's x/y, exactly the kernel loop.
    val levels = scala.collection.mutable.ArrayBuffer(
      """h0 AS (
        SELECT c_custkey, c_nationkey::BIGINT AS c_nationkey,
          (c_custkey % 65536)::BIGINT AS x, c_nationkey::BIGINT AS y,
          0::BIGINT AS d
        FROM customer)""")
    var s = 1L << 15
    var i = 0
    while (s > 0) {
      val p = s"h$i"
      i += 1
      levels += s"""h$i AS (
        SELECT c_custkey, c_nationkey,
          CASE WHEN (y & $s) > 0 THEN x
               WHEN (x & $s) > 0 THEN ${s - 1} - y ELSE y END AS x,
          CASE WHEN (y & $s) > 0 THEN y
               WHEN (x & $s) > 0 THEN ${s - 1} - x ELSE x END AS y,
          d + ${s * s}::BIGINT
            * xor(3 * (CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END),
                  (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)) AS d
        FROM $p)"""
      s >>= 1
    }
    s"""WITH ${levels.mkString(",\n")}
      SELECT c_custkey, c_nationkey, d AS h FROM h$i ORDER BY c_custkey"""
  }

  /** Layout pruning audit: for the SAME bucket count and the SAME 2-D box
    * predicate, how many buckets would each layout's min/max zone maps
    * fail to prune? Buckets are deterministic ntile ranges over each
    * layout key (naive row key, Morton [[zValue]], [[hilbertValue]]) —
    * the file-level pruning model every lakehouse scan planner applies,
    * made measurable BEFORE committing to a rewrite. Expected ordering,
    * which q395's fixture reproduces: hilbert ≤ zorder « naive.
    *
    * Scale note: the ntile windows are the AUDIT's device (run it on a
    * sample or a dimension); the production layout itself uses
    * [[zorderBy]]/[[hilbertBy]]'s range partitioner, not a window.
    */
  def layoutPruningAudit(df: DataFrame, keyCol: Column, xCol: Column,
      yCol: Column, buckets: Int,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    require(buckets >= 1 && xLo <= xHi && yLo <= yHi,
      "layoutPruningAudit needs buckets >= 1 and a non-empty box")
    import org.apache.spark.sql.expressions.Window
    val keys = df.select(keyCol.cast("long").as("k"),
        xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .withColumn("zval", zValue(col("x"), col("y")))
      .withColumn("hval", hilbertValue(col("x"), col("y")))
    val tiled = keys.select(col("x"), col("y"),
      ntile(buckets).over(Window.orderBy(col("zval"), col("k"))).as("bz"),
      ntile(buckets).over(Window.orderBy(col("hval"), col("k"))).as("bh"),
      ntile(buckets).over(Window.orderBy(col("k"))).as("bn"))
    def stats(b: String, name: String): DataFrame =
      tiled.groupBy(col(b))
        .agg(min("x").as("minx"), max("x").as("maxx"),
          min("y").as("miny"), max("y").as("maxy"))
        .agg(count(lit(1)).as("buckets_total"),
          sum(when(col("maxx") >= xLo && col("minx") <= xHi &&
            col("maxy") >= yLo && col("miny") <= yHi, 1L).otherwise(0L))
            .as("buckets_touched"))
        .select(lit(name).as("layout"), col("buckets_total"),
          col("buckets_touched"))
    stats("bz", "zorder").unionAll(stats("bh", "hilbert"))
      .unionAll(stats("bn", "naive"))
      .orderBy("layout")
  }

  // ---- q397: does the curve actually prune? -----------------------------------
  // 64 buckets over the 64x64 customer-key grid, one 8x8 box: at sf0.01
  // the zone maps touch hilbert 3 < zorder 5 < naive 14 buckets — the
  // measured version of the q395 no-seams claim.
  private def q397(s: SparkSession, d: String): DataFrame =
    layoutPruningAudit(Tables.customer(s, d), col("c_custkey"),
      col("c_custkey") % 64, expr("(c_custkey div 64) % 64"),
      buckets = 64, xLo = 8, xHi = 15, yLo = 8, yHi = 15)
  private val q397Sql = {
    val zsteps = Seq(
      "(v | (v << 16)) & 281470681808895",
      "(v | (v << 8)) & 71777214294589695",
      "(v | (v << 4)) & 1085102592571150095",
      "(v | (v << 2)) & 3689348814741910323",
      "(v | (v << 1)) & 6148914691236517205")
    val levels = scala.collection.mutable.ArrayBuffer(
      """p0 AS (
        SELECT c_custkey AS k, (c_custkey % 64)::BIGINT AS x,
          ((c_custkey // 64) % 64)::BIGINT AS y
        FROM customer)""")
    var prev = "p0"
    zsteps.zipWithIndex.foreach { case (st, i) =>
      val sx = if (i == 0) "x" else "zx"
      val sy = if (i == 0) "y" else "zy"
      levels += s"""z$i AS (SELECT k, x, y,
        ${st.replace("v", sx)} AS zx, ${st.replace("v", sy)} AS zy
        FROM $prev)"""
      prev = s"z$i"
    }
    levels += s"zf AS (SELECT k, x, y, (zx | (zy << 1))::BIGINT AS zval FROM $prev)"
    levels += "h0 AS (SELECT k, x, y, zval, x AS hx, y AS hy, 0::BIGINT AS d FROM zf)"
    var s = 1L << 15
    var i = 0
    while (s > 0) {
      val p = s"h$i"
      i += 1
      levels += s"""h$i AS (
        SELECT k, x, y, zval,
          CASE WHEN (hy & $s) > 0 THEN hx
               WHEN (hx & $s) > 0 THEN ${s - 1} - hy ELSE hy END AS hx,
          CASE WHEN (hy & $s) > 0 THEN hy
               WHEN (hx & $s) > 0 THEN ${s - 1} - hx ELSE hx END AS hy,
          d + ${s * s}::BIGINT
            * xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END),
                  (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)) AS d
        FROM $p)"""
      s >>= 1
    }
    levels += s"keys AS (SELECT k, x, y, zval, d AS hval FROM h$i)"
    levels += """tiled AS (
      SELECT x, y,
        ntile(64) OVER (ORDER BY zval, k) AS bz,
        ntile(64) OVER (ORDER BY hval, k) AS bh,
        ntile(64) OVER (ORDER BY k) AS bn
      FROM keys)"""
    def stats(b: String, name: String) =
      s"""SELECT '$name' AS layout, count(*)::BIGINT AS buckets_total,
        sum(CASE WHEN maxx >= 8 AND minx <= 15 AND maxy >= 8 AND miny <= 15
          THEN 1 ELSE 0 END)::BIGINT AS buckets_touched
      FROM (SELECT $b, min(x) AS minx, max(x) AS maxx, min(y) AS miny,
        max(y) AS maxy FROM tiled GROUP BY $b)"""
    s"""WITH ${levels.mkString(",\n")}
      SELECT * FROM (${stats("bz", "zorder")}
        UNION ALL ${stats("bh", "hilbert")}
        UNION ALL ${stats("bn", "naive")})
      ORDER BY layout"""
  }

  // ---- q138: dense ordered row ids ------------------------------------------
  // Contiguous ids over orders in o_orderkey order (unique key, so the
  // assignment is fully deterministic) — equals the single-task
  // row_number() formulation the oracle uses, minus the single task.
  private def q138(s: SparkSession, d: String): DataFrame =
    denseIds(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        orderCols = Seq("o_orderkey"), numPartitions = 32)
      .orderBy(col("row_id"))
  private val q138Sql =
    """SELECT o_orderkey, o_custkey,
         (row_number() OVER (ORDER BY o_orderkey) - 1)::BIGINT AS row_id
       FROM orders ORDER BY row_id"""

  // ---- q143: three-dimensional Z-value ----------------------------------------
  // Interleave custkey × nationkey × a derived third dimension; the
  // oracle replays the mask-shift pipeline bit-for-bit in SQL.
  private def q143(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
        (col("c_custkey") % 64).as("c_third"),
        zValue3(col("c_custkey"), col("c_nationkey"), col("c_custkey") % 64)
          .as("z3"))
      .orderBy(col("c_custkey"))
  private val q143Sql =
    """WITH a0 AS (
         SELECT c_custkey, c_nationkey::BIGINT AS c_nationkey,
           (c_custkey % 64)::BIGINT AS c_third,
           (c_custkey::BIGINT & 2097151) AS x,
           (c_nationkey::BIGINT & 2097151) AS y,
           ((c_custkey % 64)::BIGINT & 2097151) AS w
         FROM customer),
       a1 AS (SELECT c_custkey, c_nationkey, c_third,
         (x | (x << 32)) & 8725724278095871 AS x,
         (y | (y << 32)) & 8725724278095871 AS y,
         (w | (w << 32)) & 8725724278095871 AS w FROM a0),
       a2 AS (SELECT c_custkey, c_nationkey, c_third,
         (x | (x << 16)) & 8725728556220671 AS x,
         (y | (y << 16)) & 8725728556220671 AS y,
         (w | (w << 16)) & 8725728556220671 AS w FROM a1),
       a3 AS (SELECT c_custkey, c_nationkey, c_third,
         (x | (x << 8)) & 1157144660301377551 AS x,
         (y | (y << 8)) & 1157144660301377551 AS y,
         (w | (w << 8)) & 1157144660301377551 AS w FROM a2),
       a4 AS (SELECT c_custkey, c_nationkey, c_third,
         (x | (x << 4)) & 1207822528635744451 AS x,
         (y | (y << 4)) & 1207822528635744451 AS y,
         (w | (w << 4)) & 1207822528635744451 AS w FROM a3),
       a5 AS (SELECT c_custkey, c_nationkey, c_third,
         (x | (x << 2)) & 1317624576693539401 AS x,
         (y | (y << 2)) & 1317624576693539401 AS y,
         (w | (w << 2)) & 1317624576693539401 AS w FROM a4)
       SELECT c_custkey, c_nationkey, c_third,
         (x | (y << 1) | (w << 2))::BIGINT AS z3
       FROM a5 ORDER BY c_custkey"""

  /** Bucket-balance audit for a planned hash layout: rows per bucket
    * under the engine's PORTABLE polynomial hash (the [[Sketches]]
    * Mersenne-prime family — reproducible by the oracle, unlike
    * Murmur3), summarized as min/max/emptiness plus the skew ratio
    * max·B/n (1e6 ⇒ perfectly balanced) — the "will this key bucket
    * evenly at B=4096" check run BEFORE committing a bucketed table
    * layout or a repartition count.
    *
    * Exact integers end to end. Scale: one hash + count aggregation
    * (map-side partials, ≤ B rows out) and a single-row summary; the
    * B-row spine is generated so empty buckets are counted, not
    * silently absent.
    */
  def bucketBalance(df: DataFrame, keyCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val counts = df
      .select(col(keyCol).cast("long").as("k"))
      .select(expr(("((1103515245L * 1 + 12345L) % 2147483647L" +
        " * (((k % 2147483647L) + 2147483647L) % 2147483647L)" +
        s" + (12345L * 1 + 67890L) % 2147483647L) % 2147483647L % $buckets"))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
    val spine = df.sparkSession.range(buckets)
      .select(col("id").as("bucket"))
    spine.join(counts, Seq("bucket"), "left")
      .select(coalesce(col("c"), lit(0L)).as("c"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("c")).as("n_rows"),
        min(col("c")).as("min_rows"), max(col("c")).as("max_rows"),
        count(when(col("c") === 0, 1)).as("n_empty"))
      .select(col("n_buckets"), col("n_rows"), col("min_rows"),
        col("max_rows"), col("n_empty"),
        when(col("n_rows") === 0, lit(null).cast("long"))
          .otherwise(expr("max_rows * n_buckets * 1000000L div n_rows"))
          .as("skew_ratio_micro"))
  }

  // ---- q220: would orders bucket evenly across 64 buckets by custkey? ---------
  private def q220(s: SparkSession, d: String): DataFrame =
    bucketBalance(Tables.orders(s, d), "o_custkey", buckets = 64)
  private val q220Sql =
    """WITH h AS (
         SELECT ((1103515245::BIGINT * 1 + 12345) % 2147483647
           * (((o_custkey % 2147483647) + 2147483647) % 2147483647)
           + (12345::BIGINT * 1 + 67890) % 2147483647) % 2147483647 % 64
           AS bucket
         FROM orders),
       counts AS (SELECT bucket, count(*)::BIGINT AS c FROM h GROUP BY 1),
       spine AS (SELECT unnest(range(0, 64)) AS bucket),
       filled AS (
         SELECT coalesce(c, 0)::BIGINT AS c
         FROM spine LEFT JOIN counts USING (bucket))
       SELECT count(*)::BIGINT AS n_buckets, sum(c)::BIGINT AS n_rows,
         min(c)::BIGINT AS min_rows, max(c)::BIGINT AS max_rows,
         count(*) FILTER (WHERE c = 0)::BIGINT AS n_empty,
         CASE WHEN sum(c) = 0 THEN NULL
           ELSE (max(c) * count(*) * 1000000 // sum(c)) END::BIGINT
           AS skew_ratio_micro
       FROM filled"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q220_bucket_balance", q220, Some(q220Sql)),
    QueryDef("q79_zorder", q79, Some(q79Sql)),
    QueryDef("q395_hilbert", q395, Some(q395Sql)),
    QueryDef("q397_layout_pruning", q397, Some(q397Sql)),
    QueryDef("q138_dense_ids", q138, Some(q138Sql)),
    QueryDef("q143_zorder3", q143, Some(q143Sql)),
    QueryDef("q146_epoch_shuffle", q146, Some(q146Sql)))
}
