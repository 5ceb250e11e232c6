package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.expr.functions.{normalize_nfc, transliterate_ascii}

/** X1–X8 text-cleaning pipeline (SURVEY §2.7), composed column-wise so
  * Catalyst fuses the whole chain into one whole-stage-codegen'd
  * projection over the scan — the Spark analogue of the reference's
  * single unix pipe (process_pubmed.sh:84-135, one pass per row).
  */
object CleanText {

  /** X1 — whitespace collapse + edge trim (process_pubmed.sh:95-99). */
  def collapseWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** X2 — sentence-punctuation concat: title gets a '.' iff missing,
    * then `title + " " + abstract` (process_pubmed.sh:105-106). */
  def sentenceConcat(title: Column, abstract_ : Column): Column =
    concat(when(title.rlike("\\.$"), title).otherwise(concat(title, lit("."))),
      lit(" "), abstract_)

  /** X3 — first plausible 4-digit year (process_pubmed.sh:103-104). */
  def extractYear(raw: Column): Column =
    regexp_extract(raw, "(19|20)[0-9]{2}", 0)

  /** X4 — strip inline HTML-ish markup (process_pubmed.sh:117). */
  def stripMarkup(c: Column): Column =
    regexp_replace(c, "(?i)</?(sup|sub|i|b|u|em|strong|small|p|br)\\b[^>]*>", "")

  /** X6 — NBSP→space; remove zero-width chars + BOM (process_pubmed.sh:123-129). */
  def stripInvisible(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\u00A0", " "), "[\\u200B\\u200C\\u200D\\uFEFF]", "")

  /** X7 — drop control chars (process_pubmed.sh:132). */
  def stripControl(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")

  /** Full X1→X4→X5→X6→X7→X8 chain in the reference's order
    * (process_pubmed.sh:84-135). One codegen'd projection. */
  def cleanAll(c: Column): Column =
    transliterate_ascii(stripControl(stripInvisible(normalize_nfc(stripMarkup(collapseWs(c))))))

  /** X11 — order-sensitive typo-chain replacement (finalize_realease.py:495-504):
    * sequential literal replaces, deletions allowed (empty replacement). */
  def typoChain(c: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from),
        java.util.regex.Matcher.quoteReplacement(to))
    }

  /** X10 — unbalanced-paren truncation (finalize_realease.py:542-549):
    * if '(' present with no ')', keep the prefix before '('. */
  def parenTruncate(c: Column): Column =
    when(c.contains("(") && !c.contains(")"), substring_index(c, "(", 1)).otherwise(c)
}
