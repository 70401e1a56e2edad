package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.local("entry-smoke")
    val n = graft.SparkEntry.entry(s).count()
    println(s"ENTRY_ROWS=$n")
    require(n > 0, "entry must return rows")
    s.stop()
  }
}
