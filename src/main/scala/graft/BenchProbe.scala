package graft

import org.apache.spark.sql.SparkSession
import graft.analysis.Analyzer
import graft.corpus.Corpus
import graft.index.InvertedIndex

/** Scratch scaling probe: repeat the build at several parallelism levels in
 *  one JVM to separate JIT warmup from genuine scaling. Dev tool only. */
object BenchProbe {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "200000").toLong
    val plan = sys.env.get("SPARK_GRAFT_PROBE_PLAN")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(8, 8, 2, 8, 2)) // warmup first, then alternate
    for ((cpus, i) <- plan.zipWithIndex) {
      val s = session(cpus)
      try {
        val corpus = Corpus.generate(s, nDocs).cache()
        corpus.count()
        val tmp = java.nio.file.Files.createTempDirectory(s"probe-$i-").toString
        def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
        val tFrag = t(InvertedIndex.buildBlocksOf(corpus, "doc_id", "content", Analyzer.Code)
          .write.mode("overwrite").format("noop").save())
        val tMerged = t(InvertedIndex.mergedBlocksOf(corpus, "doc_id", "content", Analyzer.Code)
          .write.mode("overwrite").format("noop").save())
        val tFull = t(InvertedIndex.buildAndWrite(corpus, "doc_id", "content", tmp, Analyzer.Code))
        println(f"RUN $i cpus=$cpus frag=$tFrag%.2fs merged=$tMerged%.2fs full=$tFull%.2fs tput=${nDocs / tFull}%.0f docs/s")
        corpus.unpersist()
      } finally s.stop()
    }
  }
}
