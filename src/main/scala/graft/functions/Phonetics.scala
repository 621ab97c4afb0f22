package graft.functions

/**
 * Phonetic encoders. The reference registers `Dmetaphone` / `DmetaphoneAlt`
 * Scala UDFs from its jar (reference: `splink/internals/spark/jar_location.py:49-54`)
 * for feature engineering (`docs/topic_guides/data_preparation/feature_engineering.md`).
 * This is an independent implementation of Lawrence Philips' published
 * Double Metaphone algorithm (primary + alternate codes), plus Soundex.
 */
object Phonetics {

  private val vowels = "AEIOUY"

  def doubleMetaphone(input: String): String = doubleMetaphoneBoth(input)._1
  def doubleMetaphoneAlt(input: String): String = doubleMetaphoneBoth(input)._2

  /** Returns (primary, alternate) codes, max length 4 each. */
  def doubleMetaphoneBoth(input0: String): (String, String) = {
    if (input0 == null || input0.isEmpty) return ("", "")
    val in = input0.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (in.isEmpty) return ("", "")
    val len = in.length
    val p = new StringBuilder
    val a = new StringBuilder
    def add(s: String): Unit = { p.append(s); a.append(s) }
    def add2(pr: String, al: String): Unit = { p.append(pr); a.append(al) }
    def ch(i: Int): Char = if (i >= 0 && i < len) in.charAt(i) else 0
    def isVowel(i: Int): Boolean = i >= 0 && i < len && vowels.indexOf(in.charAt(i)) >= 0
    def at(i: Int, opts: String*): Boolean = {
      if (i < 0) return false
      opts.exists(o => i + o.length <= len && in.regionMatches(i, o, 0, o.length))
    }
    val slavoGermanic = in.contains("W") || in.contains("K") ||
      in.contains("CZ") || in.contains("WITZ")

    var i = 0
    // skip silent initial letters
    if (at(0, "GN", "KN", "PN", "WR", "PS")) i = 1
    // initial X -> S
    if (ch(0) == 'X') { add("S"); i = 1 }

    while (i < len && (p.length < 4 || a.length < 4)) {
      val c = in.charAt(i)
      c match {
        case 'A' | 'E' | 'I' | 'O' | 'U' | 'Y' =>
          if (i == 0) add("A")
          i += 1
        case 'B' =>
          add("P"); i += (if (ch(i + 1) == 'B') 2 else 1)
        case 'C' =>
          if (i > 1 && !isVowel(i - 2) && at(i - 1, "ACH") &&
              ch(i + 2) != 'I' && (ch(i + 2) != 'E' || at(i - 2, "BACHER", "MACHER"))) {
            add("K"); i += 2
          } else if (i == 0 && at(i, "CAESAR")) { add("S"); i += 2 }
          else if (at(i, "CHIA")) { add("K"); i += 2 }
          else if (at(i, "CH")) {
            if (i > 0 && at(i, "CHAE")) { add2("K", "X"); i += 2 }
            else if (i == 0 && (at(i + 1, "HARAC", "HARIS") ||
                     at(i + 1, "HOR", "HYM", "HIA", "HEM")) && !at(0, "CHORE")) {
              add("K"); i += 2
            } else if (at(0, "VAN ", "VON ") || at(0, "SCH") ||
                       at(i - 2, "ORCHES", "ARCHIT", "ORCHID") ||
                       at(i + 2, "T", "S") ||
                       ((at(i - 1, "A", "O", "U", "E") || i == 0) &&
                        at(i + 2, "L", "R", "N", "M", "B", "H", "F", "V", "W", " "))) {
              add("K"); i += 2
            } else {
              if (i > 0) { if (at(0, "MC")) add("K") else add2("X", "K") }
              else add("X")
              i += 2
            }
          }
          else if (at(i, "CZ") && !at(i - 2, "WICZ")) { add2("S", "X"); i += 2 }
          else if (at(i + 1, "CIA")) { add("X"); i += 3 }
          else if (at(i, "CC") && !(i == 1 && ch(0) == 'M')) {
            if (at(i + 2, "I", "E", "H") && !at(i + 2, "HU")) {
              if ((i == 1 && ch(i - 1) == 'A') || at(i - 1, "UCCEE", "UCCES")) add("KS")
              else add("X")
              i += 3
            } else { add("K"); i += 2 }
          }
          else if (at(i, "CK", "CG", "CQ")) { add("K"); i += 2 }
          else if (at(i, "CI", "CE", "CY")) {
            if (at(i, "CIO", "CIE", "CIA")) add2("S", "X") else add("S")
            i += 2
          }
          else {
            add("K")
            i += (if (at(i + 1, " C", " Q", " G")) 3
                  else if (at(i + 1, "C", "K", "Q") && !at(i + 1, "CE", "CI")) 2
                  else 1)
          }
        case 'D' =>
          if (at(i, "DG")) {
            if (at(i + 2, "I", "E", "Y")) { add("J"); i += 3 }
            else { add("TK"); i += 2 }
          } else if (at(i, "DT", "DD")) { add("T"); i += 2 }
          else { add("T"); i += 1 }
        case 'F' =>
          add("F"); i += (if (ch(i + 1) == 'F') 2 else 1)
        case 'G' =>
          if (ch(i + 1) == 'H') {
            if (i > 0 && !isVowel(i - 1)) { add("K"); i += 2 }
            else if (i == 0) {
              if (ch(i + 2) == 'I') add("J") else add("K"); i += 2
            } else if ((i > 1 && at(i - 2, "B", "H", "D")) ||
                       (i > 2 && at(i - 3, "B", "H", "D")) ||
                       (i > 3 && at(i - 4, "B", "H"))) { i += 2 }
            else {
              if (i > 2 && ch(i - 1) == 'U' && at(i - 3, "C", "G", "L", "R", "T")) add("F")
              else if (i > 0 && ch(i - 1) != 'I') add("K")
              i += 2
            }
          } else if (ch(i + 1) == 'N') {
            if (i == 1 && isVowel(0) && !slavoGermanic) add2("KN", "N")
            else if (!at(i + 2, "EY") && ch(i + 1) != 'Y' && !slavoGermanic) add2("N", "KN")
            else add("KN")
            i += 2
          } else if (at(i + 1, "LI") && !slavoGermanic) { add2("KL", "L"); i += 2 }
          else if (i == 0 && (ch(i + 1) == 'Y' ||
                   at(i + 1, "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER"))) {
            add2("K", "J"); i += 2
          } else if ((at(i + 1, "ER") || ch(i + 1) == 'Y') &&
                     !at(0, "DANGER", "RANGER", "MANGER") &&
                     !at(i - 1, "E", "I") && !at(i - 1, "RGY", "OGY")) {
            add2("K", "J"); i += 2
          } else if (at(i + 1, "E", "I", "Y") || at(i - 1, "AGGI", "OGGI")) {
            if (at(0, "VAN ", "VON ") || at(0, "SCH") || at(i + 1, "ET")) add("K")
            else if (at(i + 1, "IER ")) add("J")
            else add2("J", "K")
            i += 2
          } else { add("K"); i += (if (ch(i + 1) == 'G') 2 else 1) }
        case 'H' =>
          if ((i == 0 || isVowel(i - 1)) && isVowel(i + 1)) { add("H"); i += 2 }
          else i += 1
        case 'J' =>
          if (at(i, "JOSE") || at(0, "SAN ")) {
            if ((i == 0 && ch(i + 4) == ' ') || at(0, "SAN ")) add("H")
            else add2("J", "H")
            i += 1
          } else {
            if (i == 0 && !at(i, "JOSE")) add2("J", "A")
            else if (isVowel(i - 1) && !slavoGermanic && (ch(i + 1) == 'A' || ch(i + 1) == 'O'))
              add2("J", "H")
            else if (i == len - 1) add2("J", "")
            else if (!at(i + 1, "L", "T", "K", "S", "N", "M", "B", "Z") &&
                     !at(i - 1, "S", "K", "L")) add("J")
            i += (if (ch(i + 1) == 'J') 2 else 1)
          }
        case 'K' =>
          add("K"); i += (if (ch(i + 1) == 'K') 2 else 1)
        case 'L' =>
          if (ch(i + 1) == 'L') {
            if ((i == len - 3 && at(i - 1, "ILLO", "ILLA", "ALLE")) ||
                ((at(len - 2, "AS", "OS") || at(len - 1, "A", "O")) && at(i - 1, "ALLE"))) {
              add2("L", ""); i += 2
            } else { add("L"); i += 2 }
          } else { add("L"); i += 1 }
        case 'M' =>
          add("M")
          i += (if ((at(i - 1, "UMB") && (i + 1 == len - 1 || at(i + 2, "ER"))) ||
                    ch(i + 1) == 'M') 2 else 1)
        case 'N' =>
          add("N"); i += (if (ch(i + 1) == 'N') 2 else 1)
        case 'P' =>
          if (ch(i + 1) == 'H') { add("F"); i += 2 }
          else { add("P"); i += (if (at(i + 1, "P", "B")) 2 else 1) }
        case 'Q' =>
          add("K"); i += (if (ch(i + 1) == 'Q') 2 else 1)
        case 'R' =>
          if (i == len - 1 && !slavoGermanic && at(i - 2, "IE") && !at(i - 4, "ME", "MA"))
            add2("", "R")
          else add("R")
          i += (if (ch(i + 1) == 'R') 2 else 1)
        case 'S' =>
          if (at(i - 1, "ISL", "YSL")) i += 1
          else if (i == 0 && at(i, "SUGAR")) { add2("X", "S"); i += 1 }
          else if (at(i, "SH")) {
            if (at(i + 1, "HEIM", "HOEK", "HOLM", "HOLZ")) add("S") else add("X")
            i += 2
          } else if (at(i, "SIO", "SIA") || at(i, "SIAN")) {
            if (!slavoGermanic) add2("S", "X") else add("S")
            i += 3
          } else if ((i == 0 && at(i + 1, "M", "N", "L", "W")) || at(i + 1, "Z")) {
            add2("S", "X"); i += (if (at(i + 1, "Z")) 2 else 1)
          } else if (at(i, "SC")) {
            if (ch(i + 2) == 'H') {
              if (at(i + 3, "OO", "ER", "EN", "UY", "ED", "EM")) {
                if (at(i + 3, "ER", "EN")) add2("X", "SK") else add("SK")
                i += 3
              } else {
                if (i == 0 && !isVowel(3) && ch(3) != 'W') add2("X", "S") else add("X")
                i += 3
              }
            } else if (at(i + 2, "I", "E", "Y")) { add("S"); i += 3 }
            else { add("SK"); i += 3 }
          } else {
            if (i == len - 1 && at(i - 2, "AI", "OI")) add2("", "S") else add("S")
            i += (if (at(i + 1, "S", "Z")) 2 else 1)
          }
        case 'T' =>
          if (at(i, "TION") || at(i, "TIA", "TCH")) { add("X"); i += 3 }
          else if (at(i, "TH") || at(i, "TTH")) {
            if (at(i + 2, "OM", "AM") || at(0, "VAN ", "VON ") || at(0, "SCH")) add("T")
            else add2("0", "T")
            i += 2
          } else { add("T"); i += (if (at(i + 1, "T", "D")) 2 else 1) }
        case 'V' =>
          add("F"); i += (if (ch(i + 1) == 'V') 2 else 1)
        case 'W' =>
          if (at(i, "WR")) { add("R"); i += 2 }
          else {
            if (i == 0 && (isVowel(i + 1) || at(i, "WH"))) {
              if (isVowel(i + 1)) add2("A", "F") else add("A")
            }
            if ((i == len - 1 && isVowel(i - 1)) ||
                at(i - 1, "EWSKI", "EWSKY", "OWSKI", "OWSKY") || at(0, "SCH"))
              add2("", "F")
            else if (at(i, "WICZ", "WITZ")) { add2("TS", "FX"); i += 3 }
            i += 1
          }
        case 'X' =>
          if (!(i == len - 1 && (at(i - 3, "IAU", "EAU") || at(i - 2, "AU", "OU"))))
            add("KS")
          i += (if (at(i + 1, "C", "X")) 2 else 1)
        case 'Z' =>
          if (ch(i + 1) == 'H') { add("J"); i += 2 }
          else {
            if (at(i + 1, "ZO", "ZI", "ZA") || (slavoGermanic && i > 0 && ch(i - 1) != 'T'))
              add2("S", "TS")
            else add("S")
            i += (if (ch(i + 1) == 'Z') 2 else 1)
          }
        case _ => i += 1
      }
    }
    (p.result().take(4), a.result().take(4))
  }

  /** American Soundex, standard 4-char code. */
  def soundex(input: String): String = {
    if (input == null) return ""
    val s = input.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (s.isEmpty) return ""
    def code(c: Char): Char = c match {
      case 'B' | 'F' | 'P' | 'V' => '1'
      case 'C' | 'G' | 'J' | 'K' | 'Q' | 'S' | 'X' | 'Z' => '2'
      case 'D' | 'T' => '3'
      case 'L' => '4'
      case 'M' | 'N' => '5'
      case 'R' => '6'
      case _ => '0'
    }
    val sb = new StringBuilder
    sb.append(s.charAt(0))
    var prev = code(s.charAt(0))
    var i = 1
    while (i < s.length && sb.length < 4) {
      val c = s.charAt(i)
      val cd = code(c)
      if (cd != '0' && cd != prev) sb.append(cd)
      if (c != 'H' && c != 'W') prev = cd
      i += 1
    }
    while (sb.length < 4) sb.append('0')
    sb.result()
  }

  /** Classic Metaphone (L. Philips, "Hanging on the Metaphone", Computer
    * Language 7(12), 1990) — the third phonetic code the reference's
    * similarity-analysis helper emits alongside soundex and double
    * metaphone (reference: `splink/internals/similarity_analysis.py:190-217`,
    * via the `phonetics` package). Full-length code (no 4-char cap), like
    * that package. Clean-room from the published rule table; `0` encodes
    * the TH sound. */
  def metaphone(input: String): String = {
    if (input == null) return ""
    val raw = input.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (raw.isEmpty) return ""
    // initial-cluster adjustments from the rule table
    val s =
      if (raw.length >= 2 && (raw.startsWith("AE") || raw.startsWith("GN") ||
          raw.startsWith("KN") || raw.startsWith("PN") || raw.startsWith("WR")))
        raw.substring(1)
      else if (raw.startsWith("WH")) "W" + raw.substring(2)
      else if (raw.charAt(0) == 'X') "S" + raw.substring(1)
      else raw
    def ch(i: Int): Char = if (i >= 0 && i < s.length) s.charAt(i) else '\u0000'
    def isVowel(i: Int): Boolean = "AEIOU".indexOf(ch(i).toInt) >= 0
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (i > 0 && c == s.charAt(i - 1) && c != 'C') {
        // doubled letters collapse (except C, e.g. ACCept -> AKS)
      } else c match {
        case 'A' | 'E' | 'I' | 'O' | 'U' => if (i == 0) out.append(c)
        case 'B' => // -MB is silent (laMB)
          if (!(i == s.length - 1 && ch(i - 1) == 'M')) out.append('B')
        case 'C' =>
          if (ch(i + 1) == 'I' && ch(i + 2) == 'A') out.append('X') // -CIA-
          else if (ch(i + 1) == 'H') { // CH -> X, but SCH -> K; H consumed
            out.append(if (ch(i - 1) == 'S') 'K' else 'X'); i += 1
          } else if ("IEY".indexOf(ch(i + 1).toInt) >= 0) {
            if (ch(i - 1) != 'S') out.append('S') // CI/CE/CY; SCI: C silent
          } else out.append('K')
        case 'D' => // -DGE/I/Y- -> J (juDGE); G consumed
          if (ch(i + 1) == 'G' && "EIY".indexOf(ch(i + 2).toInt) >= 0) {
            out.append('J'); i += 1
          } else out.append('T')
        case 'F' => out.append('F')
        case 'G' =>
          if (ch(i + 1) == 'H') { // GH: K before a vowel, else silent (niGHt)
            if (isVowel(i + 2)) out.append('K')
            i += 1
          } else if (ch(i + 1) == 'N' && (i + 2 == s.length ||
            (i + 4 == s.length && ch(i + 2) == 'E' && ch(i + 3) == 'D'))) ()
            // G silent only in terminal -GN / -GNED (siGN, desiGNed);
            // elsewhere (maGNet) it encodes normally as K below
          else if ("IEY".indexOf(ch(i + 1).toInt) >= 0) out.append('J')
          else out.append('K')
        case 'H' => // silent after a vowel with no vowel following (JOHn)
          if (!(isVowel(i - 1) && !isVowel(i + 1))) out.append('H')
        case 'J' => out.append('J')
        case 'K' => if (ch(i - 1) != 'C') out.append('K') // -CK-: K folds into C's K
        case 'L' => out.append('L')
        case 'M' => out.append('M')
        case 'N' => out.append('N')
        case 'P' => // PH -> F; H consumed
          if (ch(i + 1) == 'H') { out.append('F'); i += 1 } else out.append('P')
        case 'Q' => out.append('K')
        case 'R' => out.append('R')
        case 'S' =>
          if (ch(i + 1) == 'H') { out.append('X'); i += 1 } // SH -> X
          else if (ch(i + 1) == 'I' &&
            (ch(i + 2) == 'O' || ch(i + 2) == 'A')) out.append('X') // -SIO-/-SIA-
          else out.append('S')
        case 'T' =>
          if (ch(i + 1) == 'I' &&
            (ch(i + 2) == 'O' || ch(i + 2) == 'A')) out.append('X') // -TIO-/-TIA-
          else if (ch(i + 1) == 'H') { out.append('0'); i += 1 } // TH -> 0
          else if (ch(i + 1) == 'C' && ch(i + 2) == 'H') () // -TCH-: T silent
          else out.append('T')
        case 'V' => out.append('F')
        case 'W' => if (isVowel(i + 1)) out.append('W') // silent unless vowel follows
        case 'X' => out.append("KS")
        case 'Y' => if (isVowel(i + 1)) out.append('Y') // silent unless vowel follows
        case 'Z' => out.append('S')
        case _ => ()
      }
      i += 1
    }
    out.result()
  }
}
