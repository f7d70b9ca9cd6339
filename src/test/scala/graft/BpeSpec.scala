package graft

import graft.operators.Bpe
import graft.operators.Bpe.Merge

/** Pins the three BPE implementations that must agree (module doc of
  * [[graft.operators.Bpe]]): the Scala trainer fold vs the Catalyst
  * `aggregate`-HOF encode kernel, on planted words covering overlap
  * runs, tie-breaks, exhausted vocabularies, and empty-token edges.
  * The third implementation (the DuckDB oracle's recursive CTE) is
  * pinned by the q109/q110 driver gates.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def am(s: Seq[String], a: String, b: String): Vector[String] =
    Bpe.applyMerge(s.toVector, a, b)

  test("applyMerge: greedy left-to-right, overlap runs, no chaining") {
    // textbook overlap behavior on runs
    assert(am(Seq("x", "x", "x", "x"), "x", "x") == Vector("xx", "xx"))
    assert(am(Seq("x", "x", "x"), "x", "x") == Vector("xx", "x"))
    assert(am(Seq("x", "x", "x", "x", "x"), "x", "x") == Vector("xx", "xx", "x"))
    // plain repeated pair
    assert(am(Seq("a", "b", "a", "b"), "a", "b") == Vector("ab", "ab"))
    // a freshly merged "ab" must NOT seed another (a,b) merge
    assert(am(Seq("a", "a", "b", "b"), "a", "b") == Vector("a", "ab", "b"))
    // no occurrence → unchanged; empty → empty
    assert(am(Seq("c", "d"), "a", "b") == Vector("c", "d"))
    assert(am(Vector.empty, "a", "b") == Vector.empty)
  }

  test("trainMerges: deterministic tie-break to smallest (a, b)") {
    // "cd" and "ab" each appear twice → pairs (a,b) and (c,d) both
    // count 2; the pick must be the lexicographically smallest pair
    val df = Seq("cd ab", "cd ab").toDF("text")
    val ms = Bpe.trainMerges(df, "text", numMerges = 2)
    assert(ms == Seq(Merge("a", "b", 2L), Merge("c", "d", 2L)))
  }

  test("trainMerges: stops early on an exhausted vocabulary") {
    // single-char words: no pairs at all → zero merges
    assert(Bpe.trainMerges(Seq("a b c").toDF("text"), "text", 5).isEmpty)
    // one two-char word: exactly one merge possible, then every word
    // is a single symbol — asking for 5 returns 1
    val ms = Bpe.trainMerges(Seq("ab ab c").toDF("text"), "text", 5)
    assert(ms == Seq(Merge("a", "b", 2L)))
  }

  test("trainMerges: maxVocab cap keeps most-frequent words, ties to smallest") {
    // cap 1: only the most frequent word ("zz" ×3) trains; "aa" (×1)
    // is dropped, so the learned pair is (z,z) not (a,a)
    val df = Seq("zz zz zz aa").toDF("text")
    val ms = Bpe.trainMerges(df, "text", numMerges = 1, maxVocab = 1)
    assert(ms == Seq(Merge("z", "z", 3L)))
  }

  /** Scala reference encode: the SAME fold the trainer uses, applied
    * per token, then the kernel's fingerprint shape ('|' within
    * token, '||' between tokens, md5 over UTF-8). */
  private def refEncode(text: String, merges: Seq[Merge]): (Long, String) = {
    val toks = text.split(" ", -1).toSeq.map(w =>
      w.map(_.toString).toVector.filter(_.nonEmpty))
    val merged = toks.map(t =>
      merges.foldLeft(t)((s, m) => Bpe.applyMerge(s, m.a, m.b)))
    val joined = merged.map(_.mkString("|")).mkString("||")
    val md = java.security.MessageDigest.getInstance("MD5")
    val fp = md.digest(joined.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (merged.map(_.size.toLong).sum, fp)
  }

  test("encode kernel == Scala trainer fold on planted words (incl. empty-token edge)") {
    val docs = Seq(
      (1L, "abab abab cd"),      // repeated merge within a token
      (2L, "aaaa aaa"),          // overlap runs [a,a,a,a] / [a,a,a]
      (3L, "aabb"),              // non-chaining edge
      (4L, "x  y"),              // double space → empty token
      (5L, "q"),                 // single char, never merged
      (6L, "abcd dcba abab"))
    val df = docs.toDF("doc_id", "text")
    val merges = Bpe.trainMerges(df, "text", numMerges = 4)
    assert(merges.nonEmpty)
    val got = Bpe.encode(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refEncode(text, merges),
        s"doc $id: kernel ${got(id)} != reference ${refEncode(text, merges)}")
    }
  }

  test("encode with zero learned merges is raw characters") {
    val df = Seq((1L, "ab c")).toDF("doc_id", "text")
    val got = Bpe.encode(df, "doc_id", "text", Nil).collect().head
    assert(got.getLong(1) == 3L)
    assert(got.getString(2) == refEncode("ab c", Nil)._2)
  }
}
