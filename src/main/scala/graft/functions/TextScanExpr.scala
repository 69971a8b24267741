package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass token/char counters — the scan-cost replacement
  * for the `size(regexp_extract_all(...))` formulations in
  * [[TextFunctions]].
  *
  * Why: counting via regexp_extract_all materializes an array of every
  * match (one UTF8String slice per token) and runs a java.util.regex
  * NFA per document, five separate passes for the q_text_stats shape —
  * at 100 TB of corpus text that is the dominant per-row cost of the
  * whole text-analysis family. Each expression here is one branch-free
  * byte scan over the UTF8 payload: no match array, no regex state
  * machine, no per-token allocation.
  *
  * Semantics are BYTE-EXACT with the regex versions (the DuckDB oracle
  * parity depends on it), including the unicode edges:
  *
  *  - whitespace = java regex `\s` DEFAULT class — the six ASCII chars
  *    { space \t \n \x0B \f \r }; a non-breaking space is a TOKEN char
  *    on both paths
  *  - `[^a-zA-Z0-9\s]` counts CODE POINTS (java character classes match
  *    per code point): UTF-8 continuation bytes are skipped, each
  *    multi-byte lead counts once
  *  - word-boundary stopword matching (`\b(w1|w2|…)\b` over word chars
  *    `[a-zA-Z0-9_]`, all single-byte) reduces to: maximal word-byte
  *    runs equal to a set word — multibyte code points are never word
  *    chars, and ASCII bytes never occur inside a UTF-8 multibyte
  *    sequence, so the byte-level run scan is exact
  *
  * A ScalaCheck property (PropertySpec) pins each expression against
  * its regex formulation on adversarial strings (unicode, empty,
  * whitespace-only, long runs).
  *
  * CodegenFallback, per the [[MinHashSignature]] precedent: the
  * surrounding projection stays whole-stage codegen'd and calls eval()
  * once per row; the loop itself is JIT-compiled scala.
  */
object TextScan {

  /** java regex default `\s`: the six ASCII whitespace chars. */
  @inline private def isSpace(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0b.toByte || b == '\f'.toByte || b == '\r'.toByte
  @inline private def isDigit(b: Byte): Boolean = b >= '0'.toByte && b <= '9'.toByte
  @inline private def isAlphaLower(b: Byte): Boolean = b >= 'a'.toByte && b <= 'z'.toByte
  @inline private def isAlpha(b: Byte): Boolean =
    isAlphaLower(b) || (b >= 'A'.toByte && b <= 'Z'.toByte)
  @inline private def isWord(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '_'.toByte
  /** UTF-8 continuation byte (never a match position of its own). */
  @inline private def isCont(b: Byte): Boolean = (b & 0xc0) == 0x80

  /** count of `\S+` runs. */
  def tokenCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    var inTok = false
    while (i < n) {
      val sp = isSpace(s.getByte(i))
      if (!sp && !inTok) count += 1
      inTok = !sp
      i += 1
    }
    count
  }

  /** count of `[a-z]+|[0-9]|[^a-z0-9\s]` matches (caller lowercases,
    * matching the `lower(c)` the regex formulation scans). The regex
    * scans left to right: a maximal lowercase-ASCII run is one match,
    * each digit one, every other CODE POINT one. */
  def bpeCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    while (i < n) {
      val b = s.getByte(i)
      if (isAlphaLower(b)) {
        count += 1
        i += 1
        while (i < n && isAlphaLower(s.getByte(i))) i += 1
      } else if (isSpace(b)) {
        i += 1
      } else {
        // digit or any other single code point (incl. A-Z the caller's
        // lowercase left behind, symbols, multibyte chars)
        if (!isCont(b)) count += 1
        i += 1
      }
    }
    count
  }

  /** count of `[^a-zA-Z0-9\s]` code points over the RAW text. */
  def punctCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    while (i < n) {
      val b = s.getByte(i)
      if (!isCont(b) && !isSpace(b) && !isAlpha(b) && !isDigit(b)) count += 1
      i += 1
    }
    count
  }

  /** java `\b`'s word class — UNICODE-aware even in default mode,
    * unlike `\w` which stays ASCII. Pattern's Bound node tests
    * `'_' || Character.isLetterOrDigit(cp)` PLUS a third clause: a
    * NON_SPACING_MARK counts as a word char when a base letter/digit
    * precedes it (skipping other marks) — so "éa" has no boundary
    * before the 'a', and "ȧ" has no boundary after the 'a'. The
    * property test caught both divergences. */
  private def isBoundWordAt(s: UTF8String, pos: Int): Boolean = {
    val cp = codePointAt(s, pos)
    if (cp == '_'.toInt || Character.isLetterOrDigit(cp)) true
    else if (Character.getType(cp) == Character.NON_SPACING_MARK) hasBase(s, pos)
    else false
  }

  /** Pattern.hasBaseCharacter: scanning backward from the mark, skip
    * marks; true iff a letter/digit is found first. java.util.regex
    * scans UTF-16 CODE UNITS, so a supplementary-plane letter before a
    * mark is seen as its LOW SURROGATE (type SURROGATE — neither
    * letter nor mark) and is NOT a base; decoding full code points
    * here silently diverged from the regex twin on exactly those
    * inputs (review r12, confirmed against java.util.regex). */
  private def hasBase(s: UTF8String, pos: Int): Boolean = {
    var j = pos
    while (j > 0) {
      j -= 1
      while (j > 0 && isCont(s.getByte(j))) j -= 1
      val cp = codePointAt(s, j)
      if (cp <= 0xFFFF && Character.isLetterOrDigit(cp)) return true
      if (cp > 0xFFFF ||
        Character.getType(cp) != Character.NON_SPACING_MARK) return false
    }
    false
  }

  /** [[isBoundWordAt]] for the code point ENDING right before `i`. */
  private def isBoundWordBefore(s: UTF8String, i: Int): Boolean = {
    var j = i - 1
    while (j > 0 && isCont(s.getByte(j))) j -= 1
    isBoundWordAt(s, j)
  }

  /** Decode the UTF-8 code point starting at byte `i` (valid input —
    * UTF8String contents; malformed bytes yield U+FFFD, a non-word). */
  private def codePointAt(s: UTF8String, i: Int): Int = {
    val b0 = s.getByte(i) & 0xff
    val n = s.numBytes()
    if (b0 < 0x80) b0
    else if (b0 < 0xe0 && i + 1 < n)
      ((b0 & 0x1f) << 6) | (s.getByte(i + 1) & 0x3f)
    else if (b0 < 0xf0 && i + 2 < n)
      ((b0 & 0x0f) << 12) | ((s.getByte(i + 1) & 0x3f) << 6) | (s.getByte(i + 2) & 0x3f)
    else if (i + 3 < n)
      ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3f) << 12) |
        ((s.getByte(i + 2) & 0x3f) << 6) | (s.getByte(i + 3) & 0x3f)
    else 0xfffd
  }

  /** count of maximal `[a-zA-Z0-9_]` runs equal to a set word AND
    * `\b`-bounded — `\b(w1|…|wn)\b` over text the caller already
    * lowercased. A run flanked by a unicode letter/digit or a
    * based mark (java's boundary class, see [[isBoundWordAt]]) is NOT
    * a match even though the flanker is outside `\w`. Words must be
    * non-empty ASCII word-char strings (validated at construction). */
  def wordSetCount(s: UTF8String, words: Array[Array[Byte]]): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    while (i < n) {
      if (isWord(s.getByte(i))) {
        val start = i
        i += 1
        while (i < n && isWord(s.getByte(i))) i += 1
        val len = i - start
        var w = 0
        var matched = false
        while (!matched && w < words.length) {
          val word = words(w)
          if (word.length == len) {
            var j = 0
            while (j < len && word(j) == s.getByte(start + j)) j += 1
            matched = j == len
          }
          w += 1
        }
        if (matched &&
            (start == 0 || !isBoundWordBefore(s, start)) &&
            (i == n || !isBoundWordAt(s, i)))
          count += 1
      } else i += 1
    }
    count
  }

  @inline private def isLowerAlnum(b: Byte): Boolean =
    isAlphaLower(b) || isDigit(b)

  /** `regexp_extract_all(lowered, "[a-z0-9]+")` as one byte scan:
    * zero-copy word slices over one lowered byte array. Takes the RAW
    * text and lowercases internally (same UTF8String.toLowerCase the
    * `lower()` column wraps). */
  def wordsExtract(s: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val lowered = s.toLowerCase
    val b = lowered.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = b.length
    while (i < n) {
      if (isLowerAlnum(b(i))) {
        val start = i
        i += 1
        while (i < n && isLowerAlnum(b(i))) i += 1
        out += UTF8String.fromBytes(b, start, i - start)
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  private val Space = UTF8String.fromString(" ")

  /** Word n-grams from a words array: each gram is the concat_ws(" ")
    * of `n` consecutive elements (nulls skipped, exactly concat_ws);
    * `distinct` keeps the FIRST occurrence order (array_distinct).
    * Fewer than `n` words → empty array — the
    * [[TextFunctions.wordNgramsFromWords]] contract. */
  def wordNgrams(arr: org.apache.spark.sql.catalyst.util.ArrayData, n: Int,
      distinct: Boolean): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val m = arr.numElements()
    if (m < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val words = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      words(i) = if (arr.isNullAt(i)) null
        else arr.getUTF8String(i)
      i += 1
    }
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      i = 0
      while (i <= m - n) {
        seen.add(UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(words, i, i + n): _*))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        seen.toArray.asInstanceOf[Array[AnyRef]])
    } else {
      val out = new Array[Any](m - n + 1)
      i = 0
      while (i <= m - n) {
        out(i) = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(words, i, i + n): _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

sealed abstract class TextScanCount
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
}

/** `size(regexp_extract_all(c, "\\S+"))` as one byte scan. */
case class TokenCount(child: Expression) extends TextScanCount {
  override def prettyName: String = "token_count"
  override protected def nullSafeEval(input: Any): Any =
    TextScan.tokenCount(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** `size(regexp_extract_all(lowered, "[a-z]+|[0-9]|[^a-z0-9\\s]"))`. */
case class BpeEstimateCount(child: Expression) extends TextScanCount {
  override def prettyName: String = "bpe_estimate_count"
  override protected def nullSafeEval(input: Any): Any =
    TextScan.bpeCount(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): BpeEstimateCount =
    copy(child = newChild)
}

/** `size(regexp_extract_all(c, "[^a-zA-Z0-9\\s]"))`. */
case class PunctCount(child: Expression) extends TextScanCount {
  override def prettyName: String = "punct_count"
  override protected def nullSafeEval(input: Any): Any =
    TextScan.punctCount(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): PunctCount =
    copy(child = newChild)
}

/** `size(regexp_extract_all(lowered, "\\b(w1|…)\\b"))` for a fixed word
  * set (stopwords, language markers). */
case class WordSetCount(child: Expression, words: Seq[String]) extends TextScanCount {
  require(words.nonEmpty && words.forall(_.matches("[a-z0-9_]+")),
    s"words must be non-empty lowercase ASCII word strings, got $words")
  override def prettyName: String = "word_set_count"

  @transient private lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray

  override protected def nullSafeEval(input: Any): Any =
    TextScan.wordSetCount(input.asInstanceOf[UTF8String], wordBytes)
  override protected def withNewChildInternal(newChild: Expression): WordSetCount =
    copy(child = newChild)
}

/** `regexp_extract_all(lower(c), "[a-z0-9]+")` — the words unit of the
  * whole corpus family — as one native byte scan over the lowered
  * UTF-8 payload (ASCII class: multibyte code points never join a run,
  * and ASCII bytes never occur inside a multibyte sequence, so the
  * byte scan is exact). */
case class WordsExtractExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "words_extract"
  override protected def nullSafeEval(input: Any): Any =
    TextScan.wordsExtract(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): WordsExtractExpr =
    copy(child = newChild)
}

/** Word n-grams over a words array — the
  * `transform(sequence(...), i -> concat_ws(" ", element_at...))`
  * (+ `array_distinct` when `distinct`) HOF chain as one native pass:
  * no interpreted lambdas, no sequence array, no per-gram element_at
  * boxing. */
case class WordNgramsExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(n >= 1, s"n must be positive, got $n")
  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (distinct) "word_ngrams" else "word_ngrams_all"
  override protected def nullSafeEval(input: Any): Any =
    TextScan.wordNgrams(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n, distinct)
  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

object TextScanExpr {
  import org.apache.spark.sql.graftshim.ColumnShim

  def wordsExtract(c: Column): Column =
    ColumnShim.column(WordsExtractExpr(ColumnShim.expression(c)))
  def wordNgrams(c: Column, n: Int, distinct: Boolean): Column =
    ColumnShim.column(WordNgramsExpr(ColumnShim.expression(c), n, distinct))
  def tokenCount(c: Column): Column =
    ColumnShim.column(TokenCount(ColumnShim.expression(c)))
  def bpeEstimateCount(c: Column): Column =
    ColumnShim.column(BpeEstimateCount(ColumnShim.expression(c)))
  def punctCount(c: Column): Column =
    ColumnShim.column(PunctCount(ColumnShim.expression(c)))
  def wordSetCount(c: Column, words: Seq[String]): Column =
    ColumnShim.column(WordSetCount(ColumnShim.expression(c), words))
}
