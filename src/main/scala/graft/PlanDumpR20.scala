package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 evidence tool: dumps the formatted plans of the INTERNAL
  * operator stages this optimization round rewired. The query-level
  * gates snapshot these frames eagerly (their `Explain` output is one
  * LogicalRDD leaf), so — like PlanDumpR19 — the "before" forms are
  * reconstructed verbatim from the r19 expressions (the same forms the
  * specs replay) next to the live "after" stages.
  *
  * Stages covered:
  *  - the quantized-Lloyd assignment expression (zip_with+aggregate
  *    fold over a nested-lit matrix → `graft_nearest_cell` /
  *    `graft_cell_dists` kernels over one typedlit Literal) — the
  *    per-iteration hot stage of q33/q75/q91/q101/q101L/q119;
  *  - the child-Lloyd per-step sums (double groupBy regroup → direct
  *    (super, child, pos) collect under [[Clustering.MaxChildSumRows]]);
  *  - the compressed-ANN candidate dot products (HOF fold →
  *    `graft_dot_q`).
  */
object PlanDumpR20 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.registerAll(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val scale = 1024
    val q = emb.select(col("vec_id").as("__id"),
      transform(col("embedding"), x => round(x.cast("double") * scale)).as("__qv"))
    // two fixed centroids are enough to show the expression shape
    val cents: Array[Array[Double]] =
      Array(Array.fill(64)(0.0), Array.fill(64)(1024.0))

    println("========== lloyd_assignment_r19form (zip_with+aggregate fold) ==========")
    locally {
      val centLit = array(cents.map(ct => array(ct.map(lit): _*)): _*)
      val ds = transform(centLit, ct => aggregate(zip_with(col("__qv"), ct, (x, y) => {
        val d = x - y
        d * d
      }), lit(0.0), (acc, x) => acc + x))
      q.withColumn("__cell", (array_position(ds, array_min(ds)) - 1).cast("int"))
        .select(col("__cell"), posexplode(col("__qv")).as(Seq("__pos", "__v")))
        .groupBy(col("__cell"), col("__pos"))
        .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
        .explain("formatted")
    }
    println("========== lloyd_assignment (graft_nearest_cell kernel) ==========")
    locally {
      val centLit = typedlit[Seq[Seq[Double]]](cents.map(_.toSeq).toSeq)
      q.withColumn("__cell", call_function("graft_nearest_cell", col("__qv"), centLit))
        .select(col("__cell"), posexplode(col("__qv")).as(Seq("__pos", "__v")))
        .groupBy(col("__cell"), col("__pos"))
        .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
        .explain("formatted")
    }

    println("========== child_lloyd_sums_r19form (regroup: 2 exchanges) ==========")
    locally {
      val withSuper = q.withColumn("__super", lit(0))
        .withColumn("__child", lit(0))
      withSuper
        .select(col("__super"), col("__child"),
          posexplode(col("__qv")).as(Seq("__pos", "__v")))
        .groupBy(col("__super"), col("__child"), col("__pos"))
        .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
        .groupBy(col("__super"), col("__child"))
        .agg(array_sort(collect_list(
          struct(col("__pos"), col("__s"), col("__n")))).as("__psn"))
        .explain("formatted")
    }
    println("========== child_lloyd_sums (direct collect: 1 exchange) ==========")
    locally {
      val withSuper = q.withColumn("__super", lit(0))
        .withColumn("__child", lit(0))
      withSuper
        .select(col("__super"), col("__child"),
          posexplode(col("__qv")).as(Seq("__pos", "__v")))
        .groupBy(col("__super"), col("__child"), col("__pos"))
        .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
        .explain("formatted")
    }

    println("========== cand_dot_r19form (HOF fold) ==========")
    locally {
      def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      q.select(col("__id"), dot(col("__qv"), col("__qv")).as("__nn"))
        .explain("formatted")
    }
    println("========== cand_dot (graft_dot_q kernel) ==========")
    q.select(col("__id"),
        call_function("graft_dot_q", col("__qv"), col("__qv")).as("__nn"))
      .explain("formatted")
    spark.stop()
  }
}
