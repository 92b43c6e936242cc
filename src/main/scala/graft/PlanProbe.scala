package graft

import org.apache.spark.sql.SparkSession
import graft.analysis.Analyzer
import graft.corpus.Corpus
import graft.index.InvertedIndex
import graft.query.Bm25

/** Dev probe: physical plans of the hot query paths over a DISK-backed index
 *  (the deployment shape) — checks term-filter pushdown to parquet, broadcast
 *  joins, and codegen coverage. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("plan-idx-").toString
    val corpus = Corpus.generate(s, 50000)
    val idx = InvertedIndex.buildAndWrite(corpus, "doc_id", "content", tmp, Analyzer.Code)

    println("===== postings scan with term filter =====")
    idx.postings.filter(org.apache.spark.sql.functions.col("term").isin("import", "parse"))
      .explain("formatted")

    println("===== bm25 topK plan =====")
    Bm25.topK(idx, Seq("import", "parse"), 10).explain("formatted")

    s.stop()
  }
}
