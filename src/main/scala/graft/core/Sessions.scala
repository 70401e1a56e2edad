package graft.core

import org.apache.spark.sql.SparkSession

/** Single place where graft SparkSessions are built, so every entry
  * point (Verify, Bench, the graft.run CLIs, tests) gets the same
  * required conf ([[Tables.RequiredConf]]) and scale-appropriate
  * shuffle parallelism. On a real cluster the same conf keys apply;
  * only `master` changes.
  */
object Sessions {

  /** local[N] session for the driver harnesses and CLIs. N and the
    * shuffle partition count both come from SPARK_GRAFT_CPUS (the
    * driver's contract); at 100 TB shuffle partitions would instead be
    * sized to ~128MB per partition, with AQE coalescing downward. */
  def local(appName: String): SparkSession = {
    // default = every core (the driver contract is local[32] with
    // shuffle partitions 32 on the 32-core bench box; a fixed small
    // default would silently run the bench 8× under-parallelized)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val b = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
    Tables.RequiredConf.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
