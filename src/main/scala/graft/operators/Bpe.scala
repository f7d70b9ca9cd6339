package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Distributed BPE tokenizer training + encoding (Sennrich et al.
  * 2016, arXiv:1508.07909 — the subword-vocabulary step every
  * training pipeline runs before anything tokenizes).
  *
  * The scale decomposition is the classic one: BPE never trains on
  * the raw corpus — it trains on the WORD-FREQUENCY table, which is
  * vocabulary-sized by Zipf no matter how large the corpus. So the
  * distributed part is exactly one shuffle (token explode → word hash
  * agg, map-side combined), the per-merge-round state is a bounded
  * `maxVocab`-row table folded in the driver (the same
  * driver-bounded-model contract as Lloyd centroids), and ENCODING is
  * pure map-side work: the learned merge list rides into the plan as
  * literals inside nested `aggregate` HOFs — no UDF, no shuffle, no
  * dictionary join.
  *
  * Merge semantics are the exact greedy left-to-right rule, expressed
  * as a left FOLD over the symbol list: append s, except when the
  * accumulator's last element equals `a` and s equals `b`, in which
  * case replace the last element with `a||b`. The fold IS greedy
  * non-overlapping merging, with no lookahead or "just merged" flag:
  * a freshly merged `a||b` can never start another (a,b) merge
  * because `a||b ≠ a` (b is nonempty). [x,x,x,x] → [xx,xx],
  * [x,x,x] → [xx,x] — the textbook behavior. The same fold runs in
  * three places that must agree: the driver trainer (Scala), the
  * encode kernel (Catalyst `aggregate` HOF), and the DuckDB oracle
  * (one recursive CTE per unrolled round) — BpeSpec pins the first
  * two against each other and the q109/q110 gates pin all three.
  *
  * Determinism: ties in pair counts break to the lexicographically
  * smallest (a, b); the vocabulary cap keeps the most frequent
  * `maxVocab` words with ties to the lexicographically smallest word.
  * Everything is integer counts and string compares — no floats, no
  * hashes, so ONE kernel serves production and the oracle (no md5
  * gate twin needed anywhere in this module).
  */
object Bpe {

  /** A learned merge: `a` + `b` → `a||b`, with the summed word-count
    * weight of the pair at the time it was picked. */
  final case class Merge(a: String, b: String, pairCount: Long)

  /** Character symbols of one word. */
  private def charSyms(w: String): Vector[String] =
    w.map(_.toString).toVector

  /** The greedy fold shared by trainer and (conceptually) the encode
    * kernel and the SQL oracle — see the module doc. */
  private[graft] def applyMerge(syms: Vector[String],
                                a: String, b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, s) =>
      if (acc.nonEmpty && acc.last == a && s == b)
        acc.init :+ (a + b)
      else acc :+ s
    }

  /** Word-frequency table of the corpus: ONE token-explode hash agg
    * (map-side combined), capped at the `maxVocab` most frequent
    * words (ties → lexicographically smallest word) so the training
    * state is driver-bounded by construction.
    */
  def wordCounts(df: DataFrame, textCol: String, maxVocab: Int): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxVocab)

  /** Learn `numMerges` BPE merges from the corpus. Returns them in
    * learning order. Driver work is O(numMerges · Σ word lengths)
    * over the capped vocabulary — milliseconds; the corpus is
    * touched exactly once (the word-count shuffle).
    */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
                  maxVocab: Int = 10000): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    var vocab: Seq[(Vector[String], Long)] =
      wordCounts(df, textCol, maxVocab).collect()
        .map(r => charSyms(r.getString(0)) -> r.getLong(1)).toSeq
    val merges = Seq.newBuilder[Merge]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true // every word is one symbol
      else {
        val ((a, b), c) = pairCounts.minBy { case ((pa, pb), pc) =>
          (-pc, pa, pb) // max count, ties to smallest (a, b)
        }
        merges += Merge(a, b, c)
        vocab = vocab.map { case (syms, cnt) => applyMerge(syms, a, b) -> cnt }
        round += 1
      }
    }
    merges.result()
  }

  /** [[trainMerges]] as a DataFrame — the q109 gate shape:
    * (round, a, b, pair_count), one row per learned merge. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainMerges(df, textCol, numMerges, maxVocab).zipWithIndex
      .map { case (m, i) => (i + 1, m.a, m.b, m.pairCount) }
      .toDF("round", "a", "b", "pair_count")
  }

  /** The greedy fold as a Catalyst expression: one `aggregate` HOF
    * per merge, the pair riding in as literals — codegen'd, map-side,
    * no UDF. `syms` is an array<string> column. */
  private def mergeCol(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(element_at(acc, -1), s))))
        .otherwise(concat(acc, array(s))))

  /** Character symbols of each token of `text`, as
    * array<array<string>> — `split(w, "")` keeps a trailing ""
    * under Spark's limit=-1 regex split, so empties are filtered. */
  private def tokenChars(text: Column): Column =
    transform(TextFunctions.tokens(text),
      w => filter(split(w, ""), c => c =!= lit("")))

  /** Encode: apply the learned merges to every token of `textCol`,
    * map-side. Returns per-row `n_symbols` (token count after
    * merging — the number the packing/budget operators would consume
    * for a subword vocabulary) and `sym_fp` (md5 over the symbol
    * stream, '|' between symbols and '||' between tokens) so a gate
    * can hash-compare the full encoding, not just its length.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val merged = merges.foldLeft(tokenChars(col(textCol))) { (syms, m) =>
      transform(syms, w => mergeCol(w, m.a, m.b))
    }
    df.select(col(idCol), merged.as("__syms"))
      .select(col(idCol),
        aggregate(col("__syms"), lit(0L), (acc, w) => acc + size(w)).as("n_symbols"),
        md5(concat_ws("||", transform(col("__syms"), w => concat_ws("|", w)))
          .cast("binary")).as("sym_fp"))
  }

  /** Train-then-encode in one call (the q110 gate shape). */
  def trainEncode(df: DataFrame, idCol: String, textCol: String,
                  numMerges: Int, maxVocab: Int = 10000): DataFrame =
    encode(df, idCol, textCol, trainMerges(df, textCol, numMerges, maxVocab))
}
