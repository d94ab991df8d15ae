package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source/sink convenience surface — the Spark-native stand-in for the
  * reference's connection handlers + format detection
  * (reference: wrangler-service service/FileTypeDetector.java and the
  * s3/gcs/bigquery/kafka/... handlers — at-scale IO here is just
  * `spark.read/write` against whatever filesystem the cluster mounts).
  */
object Sources {

  /** Extension-based format detection, mirroring FileTypeDetector's
    * behavior of keying on the file suffix.
    */
  def detectFormat(path: String): String = {
    val lower = path.toLowerCase.stripSuffix("/")
    val name = lower.substring(lower.lastIndexOf('/') + 1)
    name.substring(name.lastIndexOf('.') + 1) match {
      case "csv"             => "csv"
      case "tsv"             => "tsv"
      case "json" | "jsonl" | "ndjson" => "json"
      case "parquet" | "pq"  => "parquet"
      case "orc"             => "orc"
      case "txt" | "log"     => "text"
      case "avro"            => "avro"
      case "warc" | "wet" | "wat" => "warc"
      case "gz" if name.endsWith(".warc.gz") || name.endsWith(".wet.gz") ||
        name.endsWith(".wat.gz") => "warc"
      case "zst" if name.endsWith(".warc.zst") || name.endsWith(".wet.zst") ||
        name.endsWith(".wat.zst") => "warc"
      case _                 => "parquet" // directories default to parquet
    }
  }

  /** Read with auto-detected format and sane defaults. */
  def auto(spark: SparkSession, path: String): DataFrame =
    detectFormat(path) match {
      case "csv" =>
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "tsv" =>
        spark.read.option("header", "true").option("inferSchema", "true")
          .option("sep", "\t").csv(path)
      case "json"    => spark.read.json(path)
      case "orc"     => spark.read.orc(path)
      case "text"    => spark.read.text(path)
      case "avro"    => readAvro(spark, path)
      case "warc"    => Warc.read(spark, path)
      case _         => spark.read.parquet(path)
    }

  /** Avro container files WITHOUT the spark-avro module (absent from
    * this classpath): whole files as binary → records as JSON via the
    * avro-core reader already used by parse-as-avro-file → schema
    * inference by spark.read.json. Files are read whole (an avro
    * container is not arbitrarily splittable without the module); fine
    * for the many-files layout avro datasets ship in.
    */
  private def readAvro(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val jsons = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) => graft.ops.AvroFile.parse(pds.toArray()) }
    spark.read.json(spark.createDataset(jsons))
  }

  /** Bucketed parquet table: pre-shuffle the data ONCE at write time
    * into `buckets` hash buckets on `bucketCol` (optionally sorted
    * within buckets) so that every later equi-join or aggregation on
    * that key is exchange-free — the "pay the shuffle once, reuse it
    * forever" layout for fact tables that join repeatedly on the same
    * key at 100 TB. Registers `table` in the session catalog
    * (saveAsTable is what persists bucketing metadata; a plain
    * path-write cannot carry it). PlanSpec asserts the join of two
    * co-bucketed tables plans with zero ShuffleExchange.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCol: String = ""): Unit = {
    require(buckets > 0, "writeBucketed: buckets must be positive")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortCol.nonEmpty) w.sortBy(sortCol) else w).saveAsTable(table)
  }

  /** Partition the frame so each output file lands near `targetBytes`
    * (default 128 MB) — the small-files guard for the write side of a
    * pipeline: a 100 TB job that ends at spark.sql.shuffle.partitions
    * granularity writes millions of KB-sized files (each a namenode
    * entry and a task at read time), while one giant coalesced file
    * serializes the write. Uses Catalyst's own size estimate for the
    * plan (no extra job); `coalesce` when shrinking (narrow, no
    * shuffle), `repartition` only when growing. Row content is
    * untouched — this is layout only.
    */
  def repartitionForOutput(df: DataFrame,
      targetBytes: Long = 128L * 1024 * 1024,
      maxPartitions: Int = 200000): DataFrame = {
    require(targetBytes > 0, "repartition-output: targetBytes must be > 0")
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = (estBytes / targetBytes).toLong + 1
    val cur = df.rdd.getNumPartitions
    // Catalyst's sizeInBytes is an upper-bound GUESS for plans without
    // reliable stats (post-join products, defaultSizeInBytes fallbacks)
    // and can be off by orders of magnitude high. Shrinking on a bad
    // estimate is cheap (narrow coalesce), but GROWING is a full
    // shuffle — so cap growth at a small multiple of the current
    // partition count and surface when either cap bites instead of
    // silently scheduling a 200k-partition exchange.
    val growthCap = math.max(cur.toLong * 8, 64L)
    val n = math.max(1L,
      math.min(math.min(want, maxPartitions.toLong),
        if (want > cur) growthCap else want)).toInt
    if (want > math.min(maxPartitions.toLong, growthCap))
      System.err.println(
        s"[graft] repartition-output: size estimate ${estBytes} B asks " +
          s"for $want partitions; capped to $n (cur=$cur). If the " +
          "estimate is real, repartition explicitly; if not, ignore.")
    if (n < cur) df.coalesce(n)
    else if (n > cur) df.repartition(n)
    else df
  }

  /** Write with format keyed on the target extension. */
  def write(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    detectFormat(path) match {
      case "csv"  => df.write.mode(mode).option("header", "true").csv(path)
      case "tsv"  => df.write.mode(mode).option("header", "true")
        .option("sep", "\t").csv(path)
      case "json" => df.write.mode(mode).json(path)
      case "orc"  => df.write.mode(mode).orc(path)
      case "text" => df.write.mode(mode).text(path)
      case _      => df.write.mode(mode).parquet(path)
    }

  /** Scan pre-flight: per-path parquet footprint — file count, bytes
    * on disk, and the footer-declared row count — WITHOUT reading any
    * data pages. The cost estimate before pointing a job at a 100 TB
    * table: rows come from row-group metadata (exact and
    * engine-independent). The file LISTING is one recursive driver
    * pass per path (the same metadata operation any query planner's
    * file index performs — partitioned dt=/part-* layouts are walked);
    * the footer READS — the per-file I/O — distribute over the
    * cluster. Paths with zero parquet files still emit a row (0/0/0)
    * so a missing table reads as empty, not absent.
    */
  def footprint(spark: SparkSession, paths: Map[String, String]): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // same visibility rule as Spark's file index: underscore/dot
    // prefixed path segments (_temporary, _SUCCESS, .staging) are
    // invisible to a scan, so they must not count toward its estimate
    def visible(p: org.apache.hadoop.fs.Path): Boolean = {
      var cur = p
      while (cur != null) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return false
        cur = cur.getParent
      }
      true
    }
    val fileLists = paths.toSeq.sortBy(_._1).map { case (name, p) =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf.value)
      val files =
        if (!fs.exists(hp)) Array.empty[org.apache.hadoop.fs.FileStatus]
        else {
          val st = fs.getFileStatus(hp)
          if (st.isFile) Array(st)
          else {
            val out = scala.collection.mutable.ArrayBuffer
              .empty[org.apache.hadoop.fs.FileStatus]
            val it = fs.listFiles(hp, true) // recursive: partitioned layouts
            while (it.hasNext) {
              val f = it.next()
              if (f.isFile && f.getPath.getName.endsWith(".parquet") &&
                visible(new org.apache.hadoop.fs.Path(
                  f.getPath.toUri.getPath.stripPrefix(
                    hp.toUri.getPath).stripPrefix("/")))) out += f
            }
            out.toArray
          }
        }
      (name, files.map(f => (f.getPath.toString, f.getLen)).toSeq)
    }
    val flat = fileLists.flatMap { case (name, fl) =>
      fl.map { case (path, len) => (name, path, len) } }
    val footers = spark.sparkContext
      .parallelize(flat, math.max(1, math.min(flat.size, 64)))
      .map { case (name, path, len) =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(path), conf.value)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = r.getFooter.getBlocks
          var rows = 0L
          val it = blocks.iterator()
          while (it.hasNext) { rows += it.next().getRowCount }
          (name, 1L, len, rows)
        } finally r.close()
      }
    import org.apache.spark.sql.functions.{coalesce, lit, sum}
    val agg = footers.toDF("tbl", "files", "bytes", "n_rows")
      .groupBy($"tbl")
      .agg(sum($"files").as("files"), sum($"bytes").as("bytes"),
        sum($"n_rows").as("n_rows"))
    paths.keys.toSeq.sorted.toDF("tbl")
      .join(agg, Seq("tbl"), "left")
      .select($"tbl", coalesce($"files", lit(0L)).as("files"),
        coalesce($"bytes", lit(0L)).as("bytes"),
        coalesce($"n_rows", lit(0L)).as("n_rows"))
  }
}
