package graft.functions

/** Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", 1980 — public algorithm). Mirrors the reference's
  * WORD_STEM which delegates to rust-stemmers' English Porter stemmer
  * (`/root/reference/src/physical/operators/filter.rs` WORD_STEM arm).
  * Implementation follows the published algorithm description.
  */
object Porter {

  def stem(word: String): String = {
    if (word.length < 3) return word
    var b = word.toLowerCase
    b = step1a(b); b = step1b(b); b = step1c(b)
    b = step2(b); b = step3(b); b = step4(b); b = step5(b)
    b
  }

  private def isConsonant(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isConsonant(s, i - 1)
    case _ => true
  }

  /** Measure m of the stem: number of VC sequences. */
  private def measure(s: String): Int = {
    var m = 0; var i = 0; val n = s.length
    while (i < n && isConsonant(s, i)) i += 1
    while (i < n) {
      while (i < n && !isConsonant(s, i)) i += 1
      if (i < n) { m += 1; while (i < n && isConsonant(s, i)) i += 1 }
    }
    m
  }

  private def containsVowel(s: String): Boolean =
    s.indices.exists(i => !isConsonant(s, i))

  private def endsDoubleConsonant(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isConsonant(s, s.length - 1)

  /** *o: stem ends cvc where final c is not w, x, or y. */
  private def endsCvc(s: String): Boolean =
    s.length >= 3 && isConsonant(s, s.length - 3) && !isConsonant(s, s.length - 2) &&
      isConsonant(s, s.length - 1) && !("wxy".contains(s.charAt(s.length - 1)))

  private def step1a(s: String): String =
    if (s.endsWith("sses")) s.dropRight(2)
    else if (s.endsWith("ies")) s.dropRight(2)
    else if (s.endsWith("ss")) s
    else if (s.endsWith("s")) s.dropRight(1)
    else s

  private def step1b(s: String): String = {
    if (s.endsWith("eed")) {
      if (measure(s.dropRight(3)) > 0) s.dropRight(1) else s
    } else {
      val stripped =
        if (s.endsWith("ed") && containsVowel(s.dropRight(2))) Some(s.dropRight(2))
        else if (s.endsWith("ing") && containsVowel(s.dropRight(3))) Some(s.dropRight(3))
        else None
      stripped match {
        case None => s
        case Some(st) =>
          if (st.endsWith("at") || st.endsWith("bl") || st.endsWith("iz")) st + "e"
          else if (endsDoubleConsonant(st) && !"lsz".contains(st.last)) st.dropRight(1)
          else if (measure(st) == 1 && endsCvc(st)) st + "e"
          else st
      }
    }
  }

  private def step1c(s: String): String =
    if (s.endsWith("y") && containsVowel(s.dropRight(1))) s.dropRight(1) + "i" else s

  private val step2Pairs = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Pairs = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  /** Porter's rule lists are longest-match-only: the longest matching
    * suffix is selected first, its condition tested once, and no shorter
    * suffix is tried if that condition fails. */
  private def applyPairs(s: String, pairs: Seq[(String, String)]): String =
    pairs.filter { case (suf, _) => s.endsWith(suf) }
      .sortBy { case (suf, _) => -suf.length }
      .headOption match {
        case Some((suf, rep)) if measure(s.dropRight(suf.length)) > 0 =>
          s.dropRight(suf.length) + rep
        case _ => s
      }

  private def step2(s: String): String = applyPairs(s, step2Pairs)
  private def step3(s: String): String = applyPairs(s, step3Pairs)

  private val step4Sufs = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  /** Longest-match-only (the published algorithm): pick the single
    * longest matching suffix, test its condition once — m(stem) > 1,
    * plus stem-ends-in-s/t for "ion" — and stop either way. */
  private def step4(s: String): String =
    step4Sufs.filter(s.endsWith).sortBy(-_.length).headOption match {
      case Some(suf) =>
        val st = s.dropRight(suf.length)
        val ok = measure(st) > 1 &&
          (suf != "ion" || (st.nonEmpty && "st".contains(st.last)))
        if (ok) st else s
      case None => s
    }

  private def step5(s: String): String = {
    var r = s
    if (r.endsWith("e")) {
      val st = r.dropRight(1)
      val m = measure(st)
      if (m > 1 || (m == 1 && !endsCvc(st))) r = st
    }
    if (r.endsWith("ll") && measure(r) > 1) r = r.dropRight(1)
    r
  }
}
