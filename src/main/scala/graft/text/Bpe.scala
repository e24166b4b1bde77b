package graft.text

/** Byte-pair-encoding application with a FIXED merge table — the
  * "apply a trained tokenizer artifact" step of an LLM data pipeline
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units"; the training half — merge-candidate counting —
  * is q105 / [[graft.text.Corpus]]).
  *
  * Deployment shape: a tokenizer is a static artifact (a merge list
  * shipped with the model), so applying it is a pure per-row string
  * fold — no shuffle, no state, codegen-friendly. The encode is
  * rendered as ONE expression string shared verbatim (modulo regex
  * flavor) by the Spark plan and the DuckDB oracle, so the oracle
  * proves the Spark fold applies the merges identically.
  *
  * Encoding scheme: every non-space character is wrapped in ⟨⟩
  * markers (`"the cat"` → `"⟨t⟩⟨h⟩⟨e⟩ ⟨c⟩⟨a⟩⟨t⟩"`), then each merge
  * (a, b) → ab is one `replace(s, "⟨a⟩⟨b⟩", "⟨ab⟩")`. The markers
  * make symbol boundaries unambiguous (symbol "xa"+"b" can never
  * match merge "a"+"b"), spaces are never wrapped so merges cannot
  * cross word boundaries, and left-to-right non-overlapping
  * `replace` equals the standard leftmost-first BPE merge order
  * (`"aaa"` + merge (a,a) → `⟨aa⟩⟨a⟩`). Token count is then simply
  * the number of `⟨` markers remaining.
  *
  * Reference context: the reference pipeline stores raw text columns
  * in ClickHouse (basic_example/clickhouse.sql:24-31); token-level
  * statistics are part of this repo's LLM-pipeline mandate, not the
  * reference surface.
  */
object Bpe {

  sealed trait Flavor
  case object SparkFlavor extends Flavor
  case object DuckFlavor extends Flavor

  /** The fixed tokenizer artifact: an ordered merge list over the
    * corpus alphabet. Chains are deliberately deep (t+h → th+e;
    * s+c → sc+an; s+m → sm+a → sma+l → smal+l) so the fold order is
    * observable in the output. */
  val merges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"),
    ("a", "n"), ("s", "c"), ("sc", "an"),
    ("e", "r"), ("o", "r"), ("or", "t"),
    ("s", "t"), ("a", "t"),
    ("r", "o"), ("ro", "w"),
    ("d", "a"), ("da", "t"), ("dat", "a"),
    ("l", "i"), ("li", "n"), ("lin", "e"),
    ("s", "m"), ("sm", "a"), ("sma", "l"), ("smal", "l"),
    ("q", "u"), ("qu", "e"))

  /** `textExpr` with every non-space char wrapped in ⟨⟩ markers. */
  private def marked(textExpr: String, flavor: Flavor): String =
    flavor match {
      // Spark regexp_replace replaces all matches; backref is $1
      case SparkFlavor => s"regexp_replace($textExpr, '([^ ])', '⟨$$1⟩')"
      // DuckDB needs the 'g' flag and \1 backrefs
      case DuckFlavor  => s"regexp_replace($textExpr, '([^ ])', '⟨\\1⟩', 'g')"
    }

  /** The full encode: marker-wrap, then fold the merge table in rank
    * order. Both engines' `replace` substitutes every occurrence
    * left-to-right non-overlapping, which is exactly BPE's
    * leftmost-first merge semantics. */
  def encodedExpr(textExpr: String, flavor: Flavor,
                  table: Seq[(String, String)] = merges): String =
    table.foldLeft(marked(textExpr, flavor)) { case (acc, (a, b)) =>
      s"replace($acc, '⟨$a⟩⟨$b⟩', '⟨$a$b⟩')"
    }

  /** Token count of an already-encoded column = number of ⟨ markers
    * left. Takes the encoded COLUMN (not the raw text) so the 24-deep
    * replace chain is evaluated once per row, not once per use. */
  def tokenCountExpr(encodedCol: String): String =
    s"(length($encodedCol) - length(replace($encodedCol, '⟨', '')))"
}
