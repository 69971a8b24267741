package graft.tools

import java.util.regex.Pattern

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{TextFunctions, TextScan}

/** Scratch diagnostic: native TextScan counters vs java regex, pure JVM. */
object TextScanDebug {
  def main(args: Array[String]): Unit = {
    val sw = TextFunctions.StopwordsEn
    val pTok = Pattern.compile("\\S+")
    val pBpe = Pattern.compile("[a-z]+|[0-9]|[^a-z0-9\\s]")
    val pPun = Pattern.compile("[^a-zA-Z0-9\\s]")
    val pSw = Pattern.compile("\\b(" + sw.mkString("|") + ")\\b")
    def cnt(p: Pattern, s: String): Int = {
      val m = p.matcher(s); var c = 0; while (m.find()) c += 1; c
    }
    val swBytes = sw.map(_.getBytes("US-ASCII")).toArray
    val atoms = Seq(" ", "\t", "\n", "\u000B", "\f", "\r", "\u00A0",
      "a", "Z", "7", "_", ".", ",", "!", "-", "'",
      "é", "€", "😀", "\u0307", "ß", "İ",
      "theory", "android", "it4", "on_", "the", "and", "of", "to", "in",
      "theoryİ,", "7.forİtheon_", "😀\u0307", "İtheİ", "aİb")
    val texts = atoms ++ (for (a <- atoms; b <- atoms) yield a + b)
    var bad = 0
    texts.foreach { t =>
      val lowered = UTF8String.fromString(t).toLowerCase
      val lowStr = lowered.toString
      val u = UTF8String.fromString(t)
      val checks = Seq(
        ("tok", TextScan.tokenCount(u), cnt(pTok, t)),
        ("bpe", TextScan.bpeCount(lowered), cnt(pBpe, lowStr)),
        ("pun", TextScan.punctCount(u), cnt(pPun, t)),
        ("sw", TextScan.wordSetCount(lowered, swBytes), cnt(pSw, lowStr)))
      checks.foreach { case (n, got, want) =>
        if (got != want && bad < 20) {
          bad += 1
          val cps = t.codePoints().toArray.map(c => f"U+$c%04X").mkString(" ")
          println(s"MISMATCH $n '$cps' got=$got want=$want")
        }
      }
    }
    println(s"done bad=$bad over ${texts.size * 4} checks")
  }
}
