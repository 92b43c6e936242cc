package graft.tools

import org.apache.spark.sql.SparkSession
import graft.analysis.Analyzer
import graft.corpus.Corpus
import graft.index.InvertedIndex

/** Throwaway hot-path profiler: splits the build's per-doc cost into
 *  tokenize-only, tokenize+tf-count, and the full build job. */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val corpus = Corpus.generate(s, n).select("doc_id", "content").cache()
    corpus.count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  (${n * 1000.0 / ((System.nanoTime() - t0) / 1e6)}%.0f docs/s)")
    }
    // JIT warm
    for (_ <- 1 to 2) {
      corpus.as[(Long, String)].mapPartitions { it =>
        var acc = 0L
        it.foreach { case (_, text) => acc += Analyzer.code(text).length }
        Iterator.single(acc)
      }.reduce(_ + _)
    }
    time("tokenize-only") {
      corpus.as[(Long, String)].mapPartitions { it =>
        var acc = 0L
        it.foreach { case (_, text) => acc += Analyzer.code(text).length }
        Iterator.single(acc)
      }.reduce(_ + _)
    }
    time("tokenize+tfcount") {
      corpus.as[(Long, String)].mapPartitions { it =>
        val docTf = new java.util.HashMap[String, Array[Int]]()
        var acc = 0L
        it.foreach { case (_, text) =>
          val toks = Analyzer.code(text)
          docTf.clear()
          var i = 0
          while (i < toks.length) {
            val cell = docTf.get(toks(i))
            if (cell == null) docTf.put(toks(i), Array(1)) else cell(0) += 1
            i += 1
          }
          acc += docTf.size()
        }
        Iterator.single(acc)
      }.reduce(_ + _)
    }
    time("fragments-only (no shuffle)") {
      InvertedIndex.buildBlocksOf(corpus, "doc_id", "content", Analyzer.Code)
        .mapPartitions(it => Iterator.single(it.size)).reduce(_ + _)
    }
    time("merged (shuffle+merge)") {
      InvertedIndex.mergedBlocksOf(corpus, "doc_id", "content", Analyzer.Code).count()
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-prof-").toString
    time("full buildAndWrite") {
      InvertedIndex.buildAndWrite(corpus, "doc_id", "content", tmp, Analyzer.Code)
    }
    s.stop()
  }
}
