package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer

class AnalyzerSpec extends AnyFunSuite {

  test("simple: lowercase split on non-alnum, no empties") {
    assert(Analyzer.simple("the Fast  key").toSeq == Seq("the", "fast", "key"))
    assert(Analyzer.simple("a-b_c.d").toSeq == Seq("a", "b", "c", "d"))
    assert(Analyzer.simple("").isEmpty)
    assert(Analyzer.simple("  ").isEmpty)
  }

  test("simple equals space-split on pure [a-z ] text (oracle parity)") {
    val text = "join a filter window row join stream"
    assert(Analyzer.simple(text).toSeq == text.split(" ").toSeq)
  }

  test("code: camelCase and snake_case subtokens") {
    assert(Analyzer.code("fooBarBaz").toSeq == Seq("foobarbaz", "foo", "bar", "baz"))
    assert(Analyzer.code("snake_case").toSeq == Seq("snake", "case"))
    assert(Analyzer.code("utf8Decode").toSeq == Seq("utf8decode", "utf", "8", "decode"))
    assert(Analyzer.code("HTTPServer").toSeq == Seq("httpserver", "http", "server"))
    assert(Analyzer.code("plain").toSeq == Seq("plain"))
  }
}
