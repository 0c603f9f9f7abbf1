package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, DoubleType, StringType, DataType}

/** Column type inference over an all-string frame (SURVEY.md §2.A3).
  *
  * Semantics follow sqlite_utils.utils.TypeTracker as used by the
  * reference (datasette_upload_csvs/__init__.py:166,208-213): a
  * column is `integer` when every non-missing value parses as an
  * int, else `float` when every non-missing value parses as a float,
  * else `text`. Empty/null values are "missing" and vote for nothing;
  * an all-missing column is `integer` (the tracker's untouched
  * default).
  *
  * Spark-first re-expression: instead of a row-at-a-time tracker,
  * ONE distributed aggregate computes three counters per column
  * (map-side combined; the shuffled result is a single row of
  * O(columns) longs) — the same verdicts at any scale, one scan.
  *
  * CPython parse parity: underscore digit grouping (`1_000`,
  * `1_000.5`, `1e1_0` — single underscores between digits only, per
  * the Python numeric grammar) and bare `inf`/`-inf` spellings are
  * accepted and normalized before the cast. Remaining deviation,
  * documented: integers beyond Long range vote float, not integer —
  * Python's ints are arbitrary-precision, but casting such a value
  * to a fixed-width long would NULL it (see isInt).
  */
object TypeInference {

  sealed abstract class InferredType(val name: String, val sparkType: DataType)
  case object IntegerT extends InferredType("integer", LongType)
  case object FloatT extends InferredType("float", DoubleType)
  case object TextT extends InferredType("text", StringType)

  private def missing(c: Column): Column = c.isNull || trim(c) === ""

  // Python digitpart: digits with single underscores BETWEEN digits.
  private val D = "[0-9](_?[0-9])*"
  private val IntRe = s"^[+-]?$D$$"
  // Python float grammar: D | D. | D.D | .D, optional exponent.
  private val FloatRe = s"^[+-]?($D\\.?|$D\\.$D|\\.$D)([eE][+-]?$D)?$$"

  /** Normalize a Python-parseable numeric string to what the JVM cast
    * accepts: strip digit-grouping underscores, widen bare `inf` to
    * `Infinity` (`float("inf")` parses in Python, "inf" doesn't in
    * Spark).
    */
  private def canon(c: Column): Column = {
    val t = translate(trim(c), "_", "")
    // bare inf spellings by exact lowercase match — equivalent to the
    // anchored (?i)[+-]?inf regex, without a regex-engine pass on
    // EVERY value of EVERY column (r15 OPT: canon runs inside both
    // probes of the one-pass inference aggregate, so its per-value
    // cost multiplies across the whole upload)
    when(lower(t).isin("inf", "+inf", "-inf"),
      concat(t, lit("inity"))).otherwise(t)
  }

  // Format AND range: the applied cast is try_cast(LongType), so a
  // value that looks integral but overflows Long (e.g. 20+ digits)
  // must NOT vote integer — it would cast to NULL and silently drop
  // non-missing data. Such values fail this probe and demote the
  // column to float (Python's arbitrary-precision int can't overflow;
  // a fixed-width engine keeps the value, approximately, instead).
  // Conjunct ORDER is the r15 OPT hot-path fix: try_cast first, so
  // the Python-grammar regex only runs on values that already parse —
  // a text column's values fail the cheap cast and skip the regex
  // entirely (both conjuncts are pure, so the reorder is semantics-
  // free; And short-circuits in codegen).
  private def isInt(c: Column): Column =
    canon(c).try_cast(LongType).isNotNull && trim(c).rlike(IntRe)
  // try_cast: ANSI-safe "does it parse" probe (Spark 4 ANSI casts
  // throw). Underscored values must additionally match the Python
  // grammar — try_cast alone never sees them (canon strips first).
  private def isFloat(c: Column): Column =
    canon(c).try_cast(DoubleType).isNotNull &&
      (!trim(c).contains("_") || trim(c).rlike(FloatRe))

  /** Column reference by RAW header name: a dot or backtick in a CSV
    * header is a literal character, not nested-attribute syntax —
    * `col("price.usd")` resolves as [price].[usd] and breaks the
    * upload, so every header-name lookup goes through backtick
    * quoting. */
  private[sources] def rawCol(name: String) =
    col("`" + name.replace("`", "``") + "`")

  /** One aggregate pass → per-column verdicts. */
  def infer(df: DataFrame): Seq[(String, InferredType)] =
    inferWithCount(df)._1

  /** Same single pass, also yielding the row count — callers that
    * need both (the uploader's progress bookkeeping) get them from
    * one scan instead of two.
    */
  def inferWithCount(df: DataFrame): (Seq[(String, InferredType)], Long) = {
    val cols = df.columns.toSeq
    val counters = cols.flatMap { name =>
      val c = rawCol(name)
      // coalesce: sum over ZERO rows is NULL (a header-only upload),
      // and zero observed violations = the tracker default verdict —
      // the same all-missing semantics the spec pins for columns
      Seq(
        coalesce(sum(when(!missing(c) && !isInt(c), 1L).otherwise(0L)),
          lit(0L)).as(s"${name}__not_int"),
        coalesce(sum(when(!missing(c) && !isFloat(c), 1L).otherwise(0L)),
          lit(0L)).as(s"${name}__not_float"))
    } :+ count(lit(1L)).as("__n_rows")
    val row = df.agg(counters.head, counters.tail: _*).head()
    val types = cols.zipWithIndex.map { case (name, i) =>
      val notInt = row.getLong(2 * i)
      val notFloat = row.getLong(2 * i + 1)
      val t =
        if (notInt == 0L) IntegerT
        else if (notFloat == 0L) FloatT
        else TextT
      name -> t
    }
    (types, row.getLong(2 * cols.length))
  }

  /** Cast projection applying the verdicts; missing → NULL. The cast
    * is pipelined into whatever consumes it (no extra pass).
    */
  def applyTypes(df: DataFrame, types: Seq[(String, InferredType)]): DataFrame = {
    val byName = types.toMap
    df.select(df.columns.toSeq.map { name =>
      val c = rawCol(name)
      byName.getOrElse(name, TextT) match {
        case IntegerT => canon(c).try_cast(LongType).as(name)
        case FloatT => canon(c).try_cast(DoubleType).as(name)
        case TextT => c.as(name)
      }
    }: _*)
  }

  /** Detect + cast in one go (the types pass is its own scan; the
    * cast is lazy).
    */
  def inferAndApply(df: DataFrame): (DataFrame, Seq[(String, InferredType)]) = {
    val t = infer(df)
    (applyTypes(df, t), t)
  }
}
