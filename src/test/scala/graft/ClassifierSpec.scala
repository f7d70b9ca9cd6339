package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("trainLogistic is bit-reproducible across partitionings") {
    // the operator's core claim: exact nano-fixed-point reductions
    // make full-batch GD run-order-INVARIANT — identical weights (==
    // on doubles, not approx) whatever the partitioning
    val docs = (0 until 60).map { i =>
      (i.toLong, s"tok${i % 7} tok${i % 11} tok${i % 3} filler$i", i % 2)
    }.toDF("doc_id", "text", "y")
    val a = Classifier.trainLogistic(docs.repartition(1), "doc_id", "text",
      col("y") === 1, dim = 16, iters = 4, rate = 2.0)
    val b = Classifier.trainLogistic(docs.repartition(13), "doc_id", "text",
      col("y") === 1, dim = 16, iters = 4, rate = 2.0)
    assert(a.weights.sameElements(b.weights) && a.bias == b.bias)
    // and the weights actually moved (the loop is not a no-op)
    assert(a.weights.exists(_ != 0.0))
  }

  test("trainLogistic learns a separable signal; scoreLogistic reflects it") {
    // 'aa' (md5 bucket 10 mod 32) vs 'bb' (bucket 24) — verified
    // distinct below so a hash collision can't silently blunt the test
    val buckets = Seq("aa", "bb").toDF("t")
      .select((conv(substring(md5(col("t")), 1, 8), 16, 10)
        .cast("long") % 32).as("j")).collect().map(_.getLong(0))
    assert(buckets.distinct.length == 2, s"bucket collision: ${buckets.toSeq}")
    val docs = ((0 until 20).map(i => (i.toLong, "aa aa aa", 1)) ++
      (20 until 40).map(i => (i.toLong, "bb bb bb", 0))).toDF("doc_id", "text", "y")
    val m = Classifier.trainLogistic(docs, "doc_id", "text",
      col("y") === 1, dim = 32, iters = 5, rate = 4.0)
    val scores = Classifier.scoreLogistic(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pos = (0 until 20).map(i => scores(i.toLong))
    val neg = (20 until 40).map(i => scores(i.toLong))
    assert(pos.forall(p => p > 0.6 && p < 1.0))
    assert(neg.forall(p => p < 0.4 && p > 0.0))
    // modelToDF: dim weights + the bias row at feat -1
    val rows = Classifier.modelToDF(spark, m).collect()
    assert(rows.length == 33 && rows.count(_.getInt(0) == -1) == 1)
  }

  test("trainAndScore == trainLogistic + scoreLogistic, bit for bit") {
    // the fused path shares one feature build between training and
    // scoring; exactness means its scores must EQUAL the two-step
    // path's — including docs with a null label, which score without
    // training
    val docs = ((0 until 30).map { i =>
      (i.toLong, s"tok${i % 5} tok${i % 9} word$i", Some(i % 2))
    } :+ (99L, "tok1 tok2 unlabeled", Option.empty[Int]))
      .toDF("doc_id", "text", "y")
    val m = Classifier.trainLogistic(docs, "doc_id", "text",
      col("y") === 1, dim = 16, iters = 3, rate = 2.0)
    val twoStep = Classifier.scoreLogistic(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fused = Classifier.trainAndScore(docs, "doc_id", "text",
      col("y") === 1, dim = 16, iters = 3, rate = 2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fused == twoStep)
    assert(fused.contains(99L)) // null-label doc scores
  }

  test("null text / null label rows are excluded; an empty corpus fails loudly") {
    val docs = Seq(
      (1L, "aa bb", Some(1)),
      (2L, null.asInstanceOf[String], Some(1)), // null text: dropped
      (3L, "cc dd", None)                       // null label: dropped
    ).toDF("doc_id", "text", "y")
    val m = Classifier.trainLogistic(docs, "doc_id", "text",
      col("y") === 1, dim = 8, iters = 1, rate = 1.0)
    // only doc 1 trained: with one all-positive doc the bias gradient
    // is (0.5 - 1) = -0.5, so b = +0.5 after one unit-rate step
    assert(m.bias == 0.5)
    val empty = docs.filter(col("doc_id") > 10)
    val e = intercept[IllegalArgumentException] {
      Classifier.trainLogistic(empty, "doc_id", "text",
        col("y") === 1, dim = 8, iters = 1, rate = 1.0)
    }
    assert(e.getMessage.contains("no trainable rows"))
  }
}
