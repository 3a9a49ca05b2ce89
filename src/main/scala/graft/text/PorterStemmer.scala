package graft.text

/** Porter's suffix-stripping algorithm (M.F. Porter, "An algorithm
  * for suffix stripping", Program 14(3), 1980 — public domain
  * algorithm, implemented from the published step tables). Pure
  * function String => String over lowercase ASCII words; non-letter
  * input is returned unchanged by the caller's tokenization.
  *
  * Used once per DISTINCT word (the E21 BPE discipline): the UDF cost
  * is vocabulary-sized, not corpus-sized.
  */
object PorterStemmer {

  private def isVowelAt(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** The measure m of the stem: number of VC sequences. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowelAt(w, i)) i += 1 // leading C*
    while (i < n) {
      while (i < n && isVowelAt(w, i)) i += 1 // V+
      if (i < n) { // C+
        m += 1
        while (i < n && !isVowelAt(w, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(isVowelAt(w, _))

  private def endsDoubleC(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      !isVowelAt(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowelAt(w, n - 3) && isVowelAt(w, n - 2) &&
      !isVowelAt(w, n - 1) && !"wxy".contains(w.charAt(n - 1))
  }

  private def replaceIf(w: String, suffix: String, repl: String,
                        cond: String => Boolean): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.dropRight(suffix.length)
      if (cond(stem)) Some(stem + repl) else Some(w)
    } else None

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // Step 1b
    var extra1b = false
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else if (w.endsWith("ed") && containsVowel(w.dropRight(2))) {
      w = w.dropRight(2); extra1b = true
    } else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) {
      w = w.dropRight(3); extra1b = true
    }
    if (extra1b) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz"))
        w = w + "e"
      else if (endsDoubleC(w) && !"lsz".contains(w.charAt(w.length - 1)))
        w = w.dropRight(1)
      else if (measure(w) == 1 && endsCvc(w)) w = w + "e"
    }

    // Step 1c
    if (w.endsWith("y") && containsVowel(w.dropRight(1)))
      w = w.dropRight(1) + "i"

    // Step 2 (longest match first within each final letter; the
    // published table has disjoint suffixes, so ordered scan is fine)
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "abli" -> "able",
      "alli" -> "al", "entli" -> "ent", "eli" -> "e", "ousli" -> "ous",
      "ization" -> "ize", "ation" -> "ate", "ator" -> "ate",
      "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive",
      "biliti" -> "ble")
    step2.find(p => w.endsWith(p._1)).foreach { case (s, r) =>
      val stem = w.dropRight(s.length)
      if (measure(stem) > 0) w = stem + r
    }

    // Step 3
    val step3 = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
      "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find(p => w.endsWith(p._1)).foreach { case (s, r) =>
      val stem = w.dropRight(s.length)
      if (measure(stem) > 0) w = stem + r
    }

    // Step 4 (suffix dropped when m(stem) > 1; "ion" additionally
    // requires the stem to end in s or t)
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ion", "ism", "ate", "iti", "ous", "ive", "ize",
      "al", "er", "ic", "ou")
    step4.find(w.endsWith).foreach { s =>
      val stem = w.dropRight(s.length)
      val ok = measure(stem) > 1 &&
        (s != "ion" || stem.endsWith("s") || stem.endsWith("t"))
      if (ok) w = stem
    }

    // Step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // Step 5b
    if (measure(w) > 1 && endsDoubleC(w) && w.endsWith("l"))
      w = w.dropRight(1)

    w
  }
}
