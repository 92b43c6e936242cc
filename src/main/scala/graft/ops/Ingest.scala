package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Core ingest-pipeline processors — the OpenSearch ingest pipeline the
 * reference's own processors (text_embedding, text_chunking, sparse_encoding
 * — all implemented elsewhere in this repo) plug into. Each processor is a
 * pure column transformation, so a whole chain compiles into ONE codegen'd
 * projection over the ingest scan: no per-document interpreter, no second
 * pass, the 100 TB shape of "run this pipeline on every document".
 *
 * Supported processors mirror the core set's semantics: `set` (literal or
 * copy_from), `rename`, `remove`, `lowercase`/`uppercase`/`trim`, `gsub`,
 * `split`, `convert`. Failures the reference reports at document level
 * (missing field) are request-time schema errors here — fail-fast, the
 * batch analogue.
 */
object Ingest {

  sealed trait Processor
  /** `set`: a literal value, or copy another field (`copy_from`). */
  case class SetLit(field: String, value: Any) extends Processor
  case class SetCopy(field: String, copyFrom: String) extends Processor
  case class Rename(from: String, to: String) extends Processor
  case class Remove(field: String) extends Processor
  case class Lowercase(field: String) extends Processor
  case class Uppercase(field: String) extends Processor
  case class Trim(field: String) extends Processor
  /** `gsub`: regex replace-all on a string field. */
  case class Gsub(field: String, pattern: String, replacement: String) extends Processor
  /** `split`: string field -> array by separator regex. */
  case class Split(field: String, separator: String) extends Processor
  /** `convert`: cast to integer/long/double/string/boolean. */
  case class Convert(field: String, targetType: String) extends Processor

  def apply(docs: DataFrame, processors: Seq[Processor]): DataFrame =
    processors.foldLeft(docs) { (df, p) =>
      def req(f: String): Column = {
        require(df.columns.contains(f),
          s"ingest processor references missing field [$f]")
        col(f)
      }
      p match {
        case SetLit(f, v)     => df.withColumn(f, lit(v))
        case SetCopy(f, from) => df.withColumn(f, req(from))
        case Rename(from, to) =>
          require(!df.columns.contains(to),
            s"rename target [$to] already exists")
          df.withColumn(to, req(from)).drop(from)
        case Remove(f)    => { req(f); df.drop(f) }
        case Lowercase(f) => df.withColumn(f, lower(req(f)))
        case Uppercase(f) => df.withColumn(f, upper(req(f)))
        case Trim(f)      => df.withColumn(f, trim(req(f)))
        case Gsub(f, pat, rep) =>
          df.withColumn(f, regexp_replace(req(f), pat, rep))
        case Split(f, sep) => df.withColumn(f, split(req(f), sep))
        case Convert(f, t) =>
          require(Seq("integer", "long", "double", "string", "boolean").contains(t),
            s"convert type [$t] not supported")
          // Spark's cast yields NULL for unparseable values; the reference's
          // convert processor FAILS the document — raise per-row instead of
          // letting corruption pass through as nulls (still one projection)
          val casted = req(f).cast(if (t == "integer") "int" else t)
          df.withColumn(f,
            when(req(f).isNotNull && casted.isNull,
              raise_error(concat(lit(s"ingest convert [$f] to $t failed for value: "),
                req(f).cast("string"))))
              .otherwise(casted))
      }
    }
}
