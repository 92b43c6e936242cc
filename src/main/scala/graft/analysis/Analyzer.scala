package graft.analysis

/**
 * Text analyzers for the inverted-index build and the query side.
 *
 * The reference delegates lexical analysis to Lucene/OpenSearch analyzers and
 * consumes analyzed token streams at query time
 * (reference: query/NeuralSparseQueryBuilder.java:518-557 — analyzer-driven
 * token extraction; processor/chunker/FixedTokenLengthChunker.java:49-56 —
 * standard/letter/lowercase/whitespace tokenizers). We implement the analysis
 * chain from scratch as pure Scala functions, reused verbatim on both the
 * build path (Dataset.flatMap) and the query path, so build/query tokenization
 * can never diverge.
 *
 * Two analyzers:
 *  - `simple`: lowercase, split on non-alphanumeric runs. Equivalent SQL:
 *    `string_split(lower(text), ' ')` for space-separated corpora — used for
 *    oracle-checkable queries.
 *  - `code`: `simple` plus camelCase / snake_case / digit-boundary subtoken
 *    emission for source-code corpora (BASELINE.json north_star: "code-aware
 *    tokenization (camelCase/snake_case splitting)"). Emits both the full
 *    lowercased token and its subtokens.
 */
object Analyzer extends Serializable {

  final val Simple = "simple"
  final val Code   = "code"
  /** `simple` plus English stopword removal — the language-analyzer shape
   *  (tokenizer + per-language stop filter) of OpenSearch's `english`
   *  analyzer, with the classic public Lucene English stop set. */
  final val EnSimple = "en_simple"
  /** Per-ROW analyzer dispatch keyed by the document's `lang` column
   *  (north_star: "lang-tagged analyzers per content row"): `en` rows
   *  analyze with [[EnSimple]], everything else with [[Simple]]. On the
   *  QUERY side (no row, no lang) this name analyzes as [[Simple]] — the
   *  search_analyzer convention: index-time analysis may be language-aware
   *  while query analysis stays neutral. */
  final val LangTagged = "lang_tagged"

  /** Classic Lucene/OpenSearch English stop set (public, 33 words). */
  final val EnStopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** Analyzer name for one document's lang tag. */
  def forLang(lang: String): String =
    if (lang != null && lang.equalsIgnoreCase("en")) EnSimple else Simple

  /** Split on any run of non-alphanumeric chars, lowercase. Never emits "". */
  def simple(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    var start = -1
    while (i <= n) {
      val alnum = i < n && {
        val c = text.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
      }
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) {
        out += text.substring(start, i).toLowerCase(java.util.Locale.ROOT)
        start = -1
      }
      i += 1
    }
    out.toArray
  }

  /**
   * Code-aware analysis: every `simple` token, plus camelCase / digit-boundary
   * subtokens when the token is composite. `fooBarBaz` -> foobarbaz, foo, bar,
   * baz; `snake_case` already splits at `_` via the non-alnum rule;
   * `utf8Decode` -> utf8decode, utf, 8, decode.
   */
  def code(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    // raw tokens preserving case for camelCase detection
    val n = text.length
    var i = 0
    var start = -1
    def flush(end: Int): Unit = if (start >= 0) {
      val raw = text.substring(start, end)
      out += raw.toLowerCase(java.util.Locale.ROOT)
      val subs = splitCamel(raw)
      if (subs.length > 1) out ++= subs
      start = -1
    }
    while (i <= n) {
      val alnum = i < n && {
        val c = text.charAt(i)
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
      }
      if (alnum) { if (start < 0) start = i } else flush(i)
      i += 1
    }
    out.toArray
  }

  /** camelCase + letter/digit boundary subtokens, lowercased. */
  private[analysis] def splitCamel(tok: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = tok.length
    var start = 0
    var i = 1
    def kind(c: Char): Int =
      if (c >= '0' && c <= '9') 2 else if (c >= 'A' && c <= 'Z') 1 else 0
    while (i < n) {
      val prev = kind(tok.charAt(i - 1))
      val cur = kind(tok.charAt(i))
      val boundary =
        (prev == 0 && cur == 1) || // aB
        (prev != 2 && cur == 2) || (prev == 2 && cur != 2) || // a1, 1a
        (prev == 1 && cur == 0 && i - 1 > start) // ABc -> AB | c? Lucene-style: HTTPServer -> http, server
      if (boundary) {
        val cut = if (prev == 1 && cur == 0) i - 1 else i
        if (cut > start) out += tok.substring(start, cut).toLowerCase(java.util.Locale.ROOT)
        start = cut
      }
      i += 1
    }
    if (start < n) out += tok.substring(start, n).toLowerCase(java.util.Locale.ROOT)
    out.toArray
  }

  /** `simple` minus the English stop set. */
  def enSimple(text: String): Array[String] =
    simple(text).filterNot(EnStopwords.contains)

  def analyze(name: String)(text: String): Array[String] = name match {
    case Code     => code(text)
    case EnSimple => enSimple(text)
    case _        => simple(text) // incl. LangTagged: query-side fallback
  }
}
