package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** External JDBC connector (SURVEY.md §2B "external connectors"), backed
  * by the embedded Apache Derby engine that ships on the Spark classpath
  * — a real out-of-process-protocol source/sink exercised fully in-JVM
  * (the container has no network egress).
  *
  * Scale notes (100 TB posture): the READ path is the part that matters
  * on a cluster —
  *  - `readPartitioned` hands Spark a (partitionColumn, bounds,
  *    numPartitions) split so N executors each open their own JDBC
  *    cursor over a key range instead of one task draining the whole
  *    table through a single connection — the only way a JDBC ingest
  *    scales past one machine;
  *  - predicate pushdown: Catalyst ships `WHERE` clauses into the remote
  *    query (`PushedFilters` on the JDBC scan — spec-pinned), so the
  *    database, not Spark, drops the filtered rows before they cross
  *    the wire;
  *  - the WRITE path batches inserts per partition
  *    (`spark.jdbc.batchsize`-style batching is Spark's default JDBC
  *    writer); an RDBMS sink is for dimension/metadata tables, never
  *    the 100 TB fact path.
  */
object JdbcConnector {

  /** Derby needs a writable system home before the first connection or
    * it drops `derby.log` into the process cwd. */
  private lazy val derbyHome: String = {
    val home = Files.createTempDirectory("graft_derby_home").toString
    System.setProperty("derby.system.home", home)
    home
  }

  /** One embedded database per (JVM, name). `create=true` is idempotent. */
  def url(name: String): String = {
    derbyHome // force the system property before any connection
    s"jdbc:derby:memory:$name;create=true"
  }

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Write `df` to the embedded database as `table` (full overwrite —
    * the dimension-sync shape). */
  def write(df: DataFrame, db: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("driver", driver)
      .jdbc(url(db), table, new java.util.Properties)

  /** Single-cursor read — fine for small dims, never for facts. */
  def read(spark: SparkSession, db: String, table: String): DataFrame =
    spark.read.option("driver", driver)
      .jdbc(url(db), table, new java.util.Properties)

  /** Range-partitioned parallel read: `numPartitions` concurrent cursors
    * over `[lower, upper]` strides of `partCol` — the cluster-scale JDBC
    * ingest pattern.
    *
    * CAVEAT: the pattern is cluster-scale; this backing database is NOT.
    * `jdbc:derby:memory:` lives inside ONE JVM, so on a real cluster
    * each executor would open its own fresh empty Derby and the read
    * would fail — the partitioned-read shape only exercises correctly
    * here because tests run single-JVM local mode. Production use swaps
    * the URL for a networked database; everything else is unchanged. */
  def readPartitioned(
      spark: SparkSession, db: String, table: String,
      partCol: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read
      .option("driver", driver)
      .option("partitionColumn", partCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .jdbc(url(db), table, new java.util.Properties)
}
