package graft.ops

/** BPE MERGE-TABLE APPLICATION — the half of tokenization q71's
  * GPT-2-style regex covers only the PRE-split of: actually applying a
  * ranked merge table to each word, so token counts downstream (packing
  * budgets, price estimates) come from a real subword vocabulary, not a
  * whitespace approximation.
  *
  * Contract (deterministic, oracle-replayable): merges are applied in
  * RANK ORDER, each replacing all NON-OVERLAPPING occurrences of its
  * pair left-to-right — the training-time application order. The
  * working representation marks every symbol with a leading '|'
  * ("the" → "|t|h|e"), which makes a pair merge a plain substring
  * replace ("|t|h" → "|th") with no boundary ambiguity: a symbol can
  * only match with its full leading marker, so "th" never matches the
  * 'h' of another symbol, and adjacent occurrences never share a
  * separator (the classic " a b " space-delimited encoding drops every
  * second match for exactly that reason). Both engines replay the same
  * chain: Java's `String.replace` and DuckDB's `replace` are both
  * all-occurrences, left-to-right, non-overlapping.
  *
  * The merge table is a FIXTURE: ~60 hand-ordered English digram/
  * trigram merges (each later rule may reference symbols earlier rules
  * produce: "th"+"e" → "the") padded with generated common-letter
  * digrams to 200 rules — deterministic, offline, no external data. A
  * production deployment swaps in a learned vocabulary file through
  * the same `merges` parameter.
  *
  * Scale design: application is pure row-local CPU (O(rules × word
  * length) per word), zero shuffle — callers with Zipf-heavy corpora
  * should apply it per DISTINCT word and join counts back (what the
  * q77 oracle does), turning 100 TB of running text into a vocab-sized
  * merge workload.
  */
object Bpe {

  /** Hand-ordered head: digrams first, then trigrams composed from
    * symbols the digram rules produce. */
  private val head: Seq[(String, String)] = Seq(
    "t" -> "h", "h" -> "e", "i" -> "n", "e" -> "r", "a" -> "n",
    "r" -> "e", "o" -> "n", "a" -> "t", "e" -> "n", "o" -> "r",
    "t" -> "i", "e" -> "s", "t" -> "e", "o" -> "f", "e" -> "d",
    "i" -> "s", "a" -> "l", "a" -> "r", "s" -> "t", "t" -> "o",
    "n" -> "t", "n" -> "g", "s" -> "e", "h" -> "a", "a" -> "s",
    "o" -> "u", "i" -> "o", "l" -> "e", "v" -> "e", "c" -> "o",
    "m" -> "e", "d" -> "e", "h" -> "i", "r" -> "i", "r" -> "o",
    "i" -> "c", "n" -> "e", "e" -> "a", "r" -> "a", "c" -> "e",
    "l" -> "i", "c" -> "h", "l" -> "l", "b" -> "e", "m" -> "a",
    "s" -> "i", "o" -> "m", "u" -> "r", "w" -> "a", "p" -> "e",
    // trigrams over symbols produced above
    "th" -> "e", "in" -> "g", "an" -> "d", "en" -> "t", "io" -> "n",
    "te" -> "r", "at" -> "i", "ou" -> "t", "er" -> "s", "ha" -> "t",
    "es" -> "t", "on" -> "e", "al" -> "l", "ar" -> "e", "st" -> "r",
    // a fourth level: symbols from the trigram rules
    "t" -> "ion", "the" -> "r", "and" -> "s", "ing" -> "s")

  /** Generated tail: common-letter digrams not already present, in a
    * fixed scan order, padding the table to exactly 200 rules. */
  val MERGES: Seq[(String, String)] = {
    val common = "etaoinshrdlucmfwyp"
    val gen = for (a <- common; b <- common) yield (a.toString, b.toString)
    (head ++ gen.filterNot(head.contains)).take(200)
  }

  private val WS_SPLIT: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")

  /** Apply `merges` to one word; returns the marked symbol string
    * ("|th|e|re"). Exposed for specs; count via [[tokenCount]]. */
  def encodeWord(word: String, merges: Seq[(String, String)] = MERGES): String = {
    val sb = new java.lang.StringBuilder(word.length * 2)
    var i = 0
    while (i < word.length) { sb.append('|').append(word.charAt(i)); i += 1 }
    var s = sb.toString
    merges.foreach { case (a, b) => s = s.replace(s"|$a|$b", s"|$a$b") }
    s
  }

  /** BPE token count of a whitespace-tokenized text: sum of per-word
    * symbol counts after the merge chain. */
  def tokenCount(text: String, merges: Seq[(String, String)] = MERGES): Long =
    WS_SPLIT.split(text.trim).map(w => encodeWord(w, merges).count(_ == '|').toLong).sum
}
