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

  test("en_simple drops exactly the classic English stop set") {
    assert(Analyzer.enSimple("the fast key and a table").toSeq == Seq("fast", "key", "table"))
    assert(Analyzer.enSimple("the a an of").isEmpty)
    // stop removal happens AFTER lowercasing
    assert(Analyzer.enSimple("The Table").toSeq == Seq("table"))
  }

  test("lang-tagged dispatch: en -> en_simple, others/neutral -> simple; query side falls back to simple") {
    assert(Analyzer.forLang("en") == Analyzer.EnSimple)
    assert(Analyzer.forLang("EN") == Analyzer.EnSimple)
    assert(Analyzer.forLang("de") == Analyzer.Simple)
    assert(Analyzer.forLang(null) == Analyzer.Simple)
    assert(Analyzer.analyze(Analyzer.EnSimple)("the table").toSeq == Seq("table"))
    // a query has no lang row: LangTagged analyzes neutrally
    assert(Analyzer.analyze(Analyzer.LangTagged)("the table").toSeq == Seq("the", "table"))
  }

  test("code: camelCase and snake_case subtokens") {
    assert(Analyzer.code("fooBarBaz").toSeq == Seq("foobarbaz", "foo", "bar", "baz"))
    assert(Analyzer.code("snake_case").toSeq == Seq("snake", "case"))
    assert(Analyzer.code("utf8Decode").toSeq == Seq("utf8decode", "utf", "8", "decode"))
    assert(Analyzer.code("HTTPServer").toSeq == Seq("httpserver", "http", "server"))
    assert(Analyzer.code("plain").toSeq == Seq("plain"))
  }
}
