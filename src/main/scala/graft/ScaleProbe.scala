package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: Spark scaling ceiling on this VM for (a) pure compute,
 *  (b) an allocation-heavy string job shaped like our tokenizer. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    for (cpus <- Seq(16, 4, 16, 4)) {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"scale-$cpus")
        .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      import s.implicits._
      def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      val pure = t {
        s.range(16000000000L).select(sum(sqrt($"id"))).head()
      }
      val alloc = t {
        s.range(8000000L).map { i =>
          val sb = new StringBuilder(256)
          var j = 0
          while (j < 40) { sb.append("tok").append((i + j) % 97).append(' '); j += 1 }
          sb.toString.split(' ').map(_.toUpperCase).distinct.length
        }.select(sum($"value")).head()
      }
      println(f"SCALE cpus=$cpus pureCompute=$pure%.2fs allocHeavy=$alloc%.2fs")
      s.stop()
    }
  }
}
