package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: time one SparkEntry query by name (args: name [sfDir]),
 *  optionally printing its formatted physical plan (PLAN=1). */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = fn(s, dir)
      val n = df.count()
      println(f"[probe] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    if (sys.env.contains("PLAN")) fn(s, dir).explain("formatted")
    s.stop()
  }
}
