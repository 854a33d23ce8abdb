package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session defaults.
  *
  * These mirror what a production 100 TB deployment would set
  * cluster-wide; locally the parallelism knobs come from the env.
  *  - AQE on: runtime shuffle-partition coalescing + skew-join
  *    splitting (replaces hand-tuned partition counts at scale).
  *  - `spark.sql.shuffle.partitions` sized to the machine, not the
  *    Spark default 200 (local[32] → 32).
  *  - Session timezone pinned UTC — every time-keyed query formats
  *    wall time explicitly, so results are environment-independent.
  *  - `parquet.nanosAsLong`: the fixture `events.ts` is
  *    TIMESTAMP(NANOS) which Spark has no native type for; we read it
  *    as epoch-nanos LONG and convert to a microsecond TIMESTAMP in
  *    [[graft.sources.Tables.events]].
  */
object GraftSession {

  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder = b
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft_warehouse"))
    .config("spark.ui.enabled", "false")

  /** Local session with the engine defaults applied. */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val spark = configure(
      SparkSession.builder().appName(appName).master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
