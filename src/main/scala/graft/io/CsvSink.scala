package graft.io

import org.apache.spark.sql.DataFrame

/** CSV export (S5/C9): the reference hands batches between tasks as
  * CSV with `date_format='%Y-%m-%d %H:%M:%S.%f'`
  * (dags/mssql_to_postgresql_orders_daily.py:219). Inside one Spark job
  * the handoff itself is unnecessary (lazy DAG), but CSV export stays a
  * user-facing feature; the timestamp format is preserved so files are
  * byte-compatible with the reference's consumers.
  */
object CsvSink {

  /** `%Y-%m-%d %H:%M:%S.%f` — micros, like pandas. */
  val ReferenceTimestampFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  def write(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write
      .option("header", header.toString)
      .option("quote", "\"")
      .option("timestampFormat", ReferenceTimestampFormat)
      .option("encoding", "UTF-8")
      .mode("overwrite")
      .csv(path)
}
