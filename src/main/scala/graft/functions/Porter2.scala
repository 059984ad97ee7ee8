package graft.functions

/** Porter2 (Snowball "english") stemmer, implemented from the
  * published algorithm description (snowballstem.org/algorithms/
  * english/stemmer.html) — the `snowball(english)` filter of the
  * reference's analyzer DDL (`Useful queries.md:27-28`, SURVEY §2.B
  * B17).
  *
  * Pure function over a lowercase word; the Catalyst wrapper lives in
  * [[TextFunctions]].
  */
object Porter2 {

  private val vowels = "aeiouy".toSet
  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val validLi = "cdeghkmnrt".toSet

  private val exceptions1 = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private def isVowel(w: String, i: Int): Boolean =
    i >= 0 && i < w.length && vowels.contains(w.charAt(i)) && w.charAt(i) != 'Y'

  /** First position at/after which R1 starts (after the first
    * non-vowel following a vowel), with the gener-/commun-/arsen-
    * exceptional forms. */
  private def r1Of(w: String): Int = {
    for (p <- Seq("gener", "commun", "arsen"))
      if (w.startsWith(p)) return p.length
    regionAfter(w, 0)
  }

  private def regionAfter(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isVowel(w, i)) i += 1
    while (i < w.length && isVowel(w, i)) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** Ends in a short syllable: non-vowel + vowel + non-vowel(≠wxY),
    * or vowel + non-vowel at word start. */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w, 0) && !isVowel(w, 1)
    else if (n >= 3) {
      val c = w.charAt(n - 1)
      !isVowel(w, n - 1) && c != 'w' && c != 'x' && c != 'Y' &&
        isVowel(w, n - 2) && !isVowel(w, n - 3)
    } else false
  }

  def stem(input: String): String = {
    if (input.length <= 2) return input
    var w = input
    if (w.startsWith("'")) w = w.substring(1)
    exceptions1.get(w).foreach(return _)
    if (w.length <= 2) return w

    // mark consonant y as Y
    val sb = new StringBuilder(w)
    if (sb.nonEmpty && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.toString, i - 1)) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString
    var r1 = r1Of(w)
    var r2 = regionAfter(w, r1)
    def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    def inR2(suffixLen: Int): Boolean = w.length - suffixLen >= r2
    def containsVowel(s: String): Boolean = s.exists(c => vowels.contains(c) && c != 'Y')

    // step 0: remove the LONGEST of 's' / 's / ' — exactly one
    // removal per the Snowball spec; a loop over all three could
    // strip twice (e.g. a token ending '' + 's) and diverge from
    // reference Porter2 (code-review r10)
    Seq("'s'", "'s", "'").find(w.endsWith).foreach { s =>
      w = w.dropRight(s.length)
      r1 = math.min(r1, w.length); r2 = math.min(r2, w.length)
    }

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("ss") || w.endsWith("us")) ()
    else if (w.endsWith("s") && containsVowel(w.dropRight(2)))
      w = w.dropRight(1)

    if (exceptions2.contains(w)) return w.replace('Y', 'y')

    // step 1b
    if (w.endsWith("eedly")) { if (inR1(5)) w = w.dropRight(3) }
    else if (w.endsWith("eed")) { if (inR1(3)) w = w.dropRight(1) }
    else {
      val suff = Seq("ingly", "edly", "ing", "ed").find(w.endsWith)
      suff.foreach { s =>
        val stem0 = w.dropRight(s.length)
        if (containsVowel(stem0)) {
          w = stem0
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (w.length >= 2 && doubles.contains(w.takeRight(2))) w = w.dropRight(1)
          else if (r1 >= w.length && endsShortSyllable(w)) w += "e"
        }
      }
    }

    // step 1c: y/Y → i
    if (w.length > 2 && (w.endsWith("y") || w.endsWith("Y")) &&
      !isVowel(w, w.length - 2))
      w = w.dropRight(1) + "i"

    // step 2 (longest suffix, in R1)
    val step2: Seq[(String, String => String)] = Seq(
      "ization" -> (s => s + "ize"), "ational" -> (s => s + "ate"),
      "fulness" -> (s => s + "ful"), "ousness" -> (s => s + "ous"),
      "iveness" -> (s => s + "ive"), "tional" -> (s => s + "tion"),
      "biliti" -> (s => s + "ble"), "lessli" -> (s => s + "less"),
      "entli" -> (s => s + "ent"), "ation" -> (s => s + "ate"),
      "alism" -> (s => s + "al"), "aliti" -> (s => s + "al"),
      "ousli" -> (s => s + "ous"), "iviti" -> (s => s + "ive"),
      "fulli" -> (s => s + "ful"), "enci" -> (s => s + "ence"),
      "anci" -> (s => s + "ance"), "abli" -> (s => s + "able"),
      "izer" -> (s => s + "ize"), "ator" -> (s => s + "ate"),
      "alli" -> (s => s + "al"), "bli" -> (s => s + "ble"),
      "ogi" -> (s => if (s.endsWith("l")) s + "og" else s + "ogi"),
      "li" -> (s => if (s.nonEmpty && validLi.contains(s.last)) s else s + "li"))
    step2.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, f) =>
      if (inR1(suf.length)) w = f(w.dropRight(suf.length))
    }

    // step 3 (longest suffix, in R1; ative needs R2)
    val step3: Seq[(String, String => String)] = Seq(
      "ational" -> (s => s + "ate"), "tional" -> (s => s + "tion"),
      "alize" -> (s => s + "al"), "icate" -> (s => s + "ic"),
      "iciti" -> (s => s + "ic"), "ative" -> identity[String] _,
      "ical" -> (s => s + "ic"), "ness" -> identity[String] _,
      "ful" -> identity[String] _)
    step3.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, f) =>
      if (inR1(suf.length)) {
        if (suf == "ative") { if (inR2(suf.length)) w = w.dropRight(suf.length) }
        else w = f(w.dropRight(suf.length))
      }
    }

    // step 4 (longest suffix, in R2)
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
      "ion", "al", "er", "ic")
    step4.find(w.endsWith).foreach { suf =>
      if (inR2(suf.length)) {
        if (suf == "ion") {
          val prev = w.length - 4
          if (prev >= 0 && (w.charAt(prev) == 's' || w.charAt(prev) == 't'))
            w = w.dropRight(3)
        } else w = w.dropRight(suf.length)
      }
    }

    // step 5
    if (w.endsWith("e") &&
      (inR2(1) || (inR1(1) && !endsShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("l") && inR2(1) && w.length >= 2 &&
      w.charAt(w.length - 2) == 'l')
      w = w.dropRight(1)

    w.replace('Y', 'y')
  }
}
