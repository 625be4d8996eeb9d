package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Chain
import graft.ops._
import graft.ext._
import TestSpark._

/** Gates for the round-13 tenth batch: product quantization
  * (pqFit / pqEncode / pqDecode).
  */
class Round13Batch10Spec extends AnyFunSuite {
  import spark.implicits._

  private def lattice = Chain(spark, "pq_fix", SparkEntry.embFixtureDf(spark))

  test("pqFit: model shape, determinism, and the dim-divisibility guard") {
    val m1 = lattice.pqFit("vec_id", "embedding", m = 2, ks = 4,
      trainSample = 24, iters = 10).df.collect()
    assert(m1.length == 8, "2 blocks x 4 centroids")
    assert(m1.forall(_.getSeq[Double](2).length == 8), "block dim 16/2")
    val m2 = lattice.pqFit("vec_id", "embedding", m = 2, ks = 4,
      trainSample = 24, iters = 10).df.collect()
    assert(m1.map(_.toString).sorted.sameElements(m2.map(_.toString).sorted),
      "the fit is a pure function of the data")
    intercept[IllegalArgumentException] {
      lattice.pqFit("vec_id", "embedding", m = 3, ks = 4, trainSample = 24)
    }
    intercept[IllegalArgumentException] {
      lattice.pqFit("vec_id", "embedding", m = 2, ks = 300)
    }
  }

  test("pqEncode: codes in range, cluster-consistent, null vector stays null") {
    val model = lattice.pqFit("vec_id", "embedding", m = 2, ks = 4,
      trainSample = 24, iters = 10)
    val coded = lattice.pqEncode(model.df, "embedding").df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(coded.size == 24)
    coded.values.foreach { cs =>
      assert(cs.length == 2 && cs.forall(ci => ci >= 0 && ci < 4))
    }
    // the lattice's 4 planted clusters must share codes within a cluster
    (0 until 4).foreach { cl =>
      val members = (0 until 24).filter(_ % 4 == cl).map(i => coded(i.toLong))
      assert(members.distinct.size == 1,
        s"cluster $cl members must encode identically, got ${members.distinct}")
    }
    // the pinned pattern the q_pq_encode oracle replays: cluster (id%4)
    // 0..3 encode as (1,2) (2,3) (0,0) (3,1)
    val expect = Map(0 -> Seq(1, 2), 1 -> Seq(2, 3), 2 -> Seq(0, 0), 3 -> Seq(3, 1))
    coded.foreach { case (id, cs) =>
      assert(cs == expect((id % 4).toInt), s"vec $id code $cs")
    }
    val withNull = Chain(spark, "pqn", Seq(
      (1L, Some(Seq.fill(16)(0.5f))), (2L, Option.empty[Seq[Float]]))
      .toDF("vec_id", "embedding"))
    val r = withNull.pqEncode(model.df, "embedding").df
      .collect().map(x => x.getLong(0) -> x.isNullAt(2)).toMap
    assert(!r(1L) && r(2L), "null vector must stay null")
    intercept[Exception] {
      Chain(spark, "pqs", Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding"))
        .pqEncode(model.df, "embedding").df.collect()
    }
  }

  test("pqDecode: reconstruction recovers cluster geometry; nulls pass through") {
    val model = lattice.pqFit("vec_id", "embedding", m = 2, ks = 4,
      trainSample = 24, iters = 10)
    val decoded = lattice.pqEncode(model.df, "embedding")
      .pqDecode(model.df, "pq_code")
    val cos = decoded.df.select(col("vec_id"),
      (graft.core.Exact.dot(col("embedding"), col("pq_decoded")) /
        sqrt(graft.core.Exact.dot(col("embedding"), col("embedding"))) /
        sqrt(graft.core.Exact.dot(col("pq_decoded"), col("pq_decoded"))))
        .as("c")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cos.values.forall(_ > 0.97),
      s"decoded vectors must hug their originals, worst ${cos.values.min}")
    intercept[IllegalArgumentException] {
      decoded.pqDecode(model.df.drop("centroid"), "pq_code")
    }
  }

  test("searchPq: lattice queries recall their whole planted cluster, ties id-ordered") {
    val model = lattice.pqFit("vec_id", "embedding", m = 2, ks = 4,
      trainSample = 24, iters = 10)
    val coded = lattice.pqEncode(model.df, "embedding")
    val corpus = Chain(spark, "pq_corpus",
      coded.df.select(col("vec_id"), col("pq_code")))
    val got = corpus.searchPq(model.df,
        SparkEntry.embFixtureDf(spark).where("vec_id < 4"),
        "vec_id", "embedding", k = 5)
      .df.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // every query's nearest code is its own cluster's — the 5 siblings in
    // id order, all at the IDENTICAL tied distance
    (0 until 4).foreach { q =>
      val expect = (1 to 5).map(j => (q + 4 * j).toLong)
      val rows = (1 to 5).map(rk => got((q.toLong, rk)))
      assert(rows.map(_._1) == expect, s"query $q: ${rows.map(_._1)}")
      assert(rows.map(_._2).distinct.size == 1,
        s"same-code siblings must tie exactly, got ${rows.map(_._2)}")
    }
  }

  test("searchPq: kernel distances replay exactly on the driver; guards refuse misuse") {
    val emb = table("embeddings")
    val model = emb.pqFit("vec_id", "embedding", m = 8, ks = 16,
      trainSample = 500, iters = 10)
    val coded = emb.pqEncode(model.df, "embedding")
    val corpus = Chain(spark, "pq_corpus2",
      coded.df.select(col("vec_id"), col("pq_code")))
    val res = corpus.searchPq(model.df, emb.df.where("vec_id < 3"),
      "vec_id", "embedding", k = 500).df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // driver replay with the kernel's exact loop order
    val centers = model.df.orderBy("block", "cid").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val codeMap = coded.df.select("vec_id", "pq_code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val vecMap = emb.df.where("vec_id < 3").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val bd = centers(0)._3.length
    def adc(q: Array[Float], code: Array[Int]): Double = {
      var acc = 0.0
      code.indices.foreach { b =>
        val cv = centers.find(c => c._1 == b && c._2 == code(b)).get._3
        var j = 0
        while (j < bd) {
          val d = q(b * bd + j).toDouble - cv(j); acc += d * d; j += 1
        }
      }
      acc
    }
    res.foreach { case ((qid, nid), dist) =>
      assert(dist == adc(vecMap(qid), codeMap(nid)), s"pair ($qid, $nid)")
    }
    intercept[IllegalArgumentException] {
      corpus.searchPq(model.df, emb.df, "vec_id", "embedding", k = 0)
    }
    intercept[IllegalArgumentException] {
      corpus.searchPq(model.df, emb.df.drop("embedding"), "vec_id", "embedding")
    }
  }

  test("pq on real embeddings: decoded-cosine top-10 recall stays above the floor") {
    // measured frontier on the 64-dim fixture embeddings (500 train rows):
    // m=8/ks=256 -> 0.61 (8 B/vec), m=16/ks=256 -> 0.775 (16 B),
    // m=32/ks=256 -> 0.92 (32 B); headline m=16/ks=256, floor 0.70
    val emb = table("embeddings")
    val model = emb.pqFit("vec_id", "embedding", m = 16, ks = 256,
      trainSample = 500, iters = 10)
    val decoded = emb.pqEncode(model.df, "embedding")
      .pqDecode(model.df, "pq_code")
    val dec = Chain(spark, "pq_dec",
      decoded.df.select(col("vec_id"), col("pq_decoded").as("embedding")))
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val queries = emb.df.where("vec_id < 20")
    val decQueries = dec.df.where("vec_id < 20")
    val exact = pairs(emb.cosineTopK(queries, "vec_id", "embedding", 10).df)
    val approx = pairs(dec.cosineTopK(decQueries, "vec_id", "embedding", 10).df)
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.70,
      s"pq m=16 ks=256 decoded recall@10 must hold the 0.70 floor, got $recall")
  }
}
