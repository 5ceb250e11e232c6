package graft.expr

import java.text.Normalizer

/** JVM-static kernels for the text-normalization expressions. Kept as
  * plain static-style methods so generated code (whole-stage codegen)
  * can call them directly: `graft.expr.TextNorm.nfc(...)`.
  *
  * Reference semantics:
  *  - nfc: `uconv -x Any-NFC` (process_pubmed.sh:120). JVM
  *    `java.text.Normalizer` and ICU agree on NFC for all assigned
  *    codepoints we care about; divergent unassigned-codepoint edge
  *    cases are documented in TextNormSpec (SURVEY §7 unicode note).
  *  - asciiTranslit: `iconv -t ASCII//TRANSLIT` (process_pubmed.sh:135):
  *    NFD-decompose, drop combining marks, map common typographic
  *    punctuation, replace any remaining non-ASCII with '?' (iconv's
  *    untranslatable marker).
  *  - normalizeCompound: finalize_realease.py:517-525, order-faithful
  *    including the reference's quirk that unicode dashes are mapped to
  *    ASCII '-' *after* the [-\s] strip (so they survive normalization).
  */
object TextNorm {

  def nfc(s: String): String =
    if (s == null) null else Normalizer.normalize(s, Normalizer.Form.NFC)

  private val punctMap: Map[Char, String] = Map(
    '–' -> "-", '—' -> "-", '−' -> "-",  // en/em-dash, minus
    '‘' -> "'", '’' -> "'", '‚' -> "'",  // single quotes
    '“' -> "\"", '”' -> "\"", '„' -> "\"", // double quotes
    '×' -> "x", '÷' -> "/",
    '≥' -> ">=", '≤' -> "<=",
    '°' -> "deg", 'µ' -> "u", 'μ' -> "u", // degree, micro, mu
    '…' -> "...", ' ' -> " ",
    'ß' -> "ss", 'Æ' -> "AE", 'æ' -> "ae",
  )

  def asciiTranslit(s: String): String = {
    if (s == null) return null
    val decomposed = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val ch = decomposed.charAt(i)
      if (ch < 128) sb.append(ch)
      else if (Character.getType(ch) == Character.NON_SPACING_MARK) () // strip accents
      else punctMap.get(ch) match {
        case Some(rep) => sb.append(rep)
        case None      => sb.append('?')
      }
      i += 1
    }
    sb.toString
  }

  def normalizeCompound(name: String): String = {
    if (name == null) return null
    // order-faithful to the reference: strip [-\s] first, THEN map
    // unicode dashes to '-', then the (now no-op) whitespace collapse.
    var norm = name.trim.toLowerCase
    norm = norm.replaceAll("[-\\s]", "")
    norm = norm.replace('–', '-').replace('—', '-').replace('−', '-')
    norm = norm.replaceAll("\\s+", " ")
    val keepSuffix = norm.endsWith("us") || norm.endsWith("is") ||
      norm.endsWith("os") || norm.endsWith("gas")
    if (norm.length > 4 && norm.endsWith("s") && !keepSuffix) norm.substring(0, norm.length - 1)
    else norm
  }
}
