package graft

import graft.operators.Whitening
import org.apache.spark.sql.functions._

/** Whitening/PCA: the fitted map must actually decorrelate — whitened
  * sample covariance ≈ I on the fitted corpus, PCA captures planted
  * factor structure — plus the Jacobi solver against hand-checkable
  * eigensystems and the ragged-input guard. */
class WhiteningSpec extends SparkSpec {
  import spark.implicits._

  private val d = 6

  /** Deterministic anisotropic corpus: a 2-factor linear structure
    * plus small deterministic per-dim jitter (full-rank covariance,
    * every eigenvalue ≫ eps). */
  private def corpus(n: Int) = (0 until n).map { i =>
    val s = math.sin(i * 1.7) * 2.0 + 0.5
    val t = math.cos(i * 0.9) * 5.0
    val base = Array(s, 2 * s + t, -s, 3 * t, t - s, 0.5 * s + 1.0)
    val jittered = Array.tabulate(d)(j =>
      base(j) + 0.05 * math.sin((i + 1) * (j + 2) * 1.234))
    (i.toLong, jittered)
  }.toDF("id", "vec")

  private def gather(df: org.apache.spark.sql.DataFrame): Array[Array[Double]] =
    df.orderBy("id").collect().map(_.getSeq[Double](1).toArray)

  private def sampleCov(xs: Array[Array[Double]]): Array[Array[Double]] = {
    val n = xs.length
    val dim = xs.head.length
    val mean = Array.tabulate(dim)(j => xs.map(_(j)).sum / n)
    Array.tabulate(dim, dim) { (i, j) =>
      xs.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum / n
    }
  }

  test("whiten: sample covariance of the fitted corpus becomes ~I, mean ~0") {
    val df = corpus(400)
    val model = Whitening.fit(df, "vec", d)
    val white = gather(Whitening.whiten(df, "vec", model))
    white.length shouldBe 400
    val cov = sampleCov(white)
    (0 until d).foreach { i =>
      math.abs(cov(i)(i) - 1.0) should be < 1e-6
      (0 until d).foreach { j =>
        if (i != j) math.abs(cov(i)(j)) should be < 1e-6
      }
    }
    val mean = Array.tabulate(d)(j => white.map(_(j)).sum / white.length)
    all(mean.map(math.abs).toSeq) should be < 1e-8
  }

  test("pcaProject: two planted factors capture ~all variance; " +
      "whitened projection has ~unit-variance uncorrelated components") {
    val df = corpus(400)
    val model = Whitening.fit(df, "vec", d)
    // eigenvalues descending, and the 2-factor structure dominates
    model.lambda.zip(model.lambda.tail).foreach { case (a, b) =>
      a should be >= b
    }
    (model.lambda(0) + model.lambda(1)) / model.lambda.sum should be > 0.999
    val proj = gather(Whitening.pcaProject(df, "vec", model, k = 2))
    proj.head.length shouldBe 2
    // PCA coordinates are uncorrelated with variance = eigenvalue
    val pcov = sampleCov(proj)
    math.abs(pcov(0)(0) - model.lambda(0)) should be < 1e-6 * model.lambda(0)
    math.abs(pcov(1)(1) - model.lambda(1)) should be < 1e-6 * model.lambda(0)
    math.abs(pcov(0)(1)) should be < 1e-6 * model.lambda(0)
    // whitened=true rescales both components to ~unit variance
    val pw = sampleCov(gather(
      Whitening.pcaProject(df, "vec", model, k = 2, whitened = true)))
    math.abs(pw(0)(0) - 1.0) should be < 1e-6
    math.abs(pw(1)(1) - 1.0) should be < 1e-6
  }

  test("fit is partitioning-stable to float tolerance; ragged vectors " +
      "skipped in fit and NULLed in apply; tiny corpora refused") {
    val df = corpus(200)
    val m1 = Whitening.fit(df, "vec", d)
    val m2 = Whitening.fit(df.repartition(13), "vec", d)
    m1.mean.zip(m2.mean).foreach { case (a, b) =>
      math.abs(a - b) should be < 1e-9
    }
    m1.lambda.zip(m2.lambda).foreach { case (a, b) =>
      math.abs(a - b) should be < 1e-8 * math.max(1.0, math.abs(a))
    }
    // a ragged row: ignored by fit, NULL out of the apply
    val ragged = df.unionByName(
      Seq((9999L, Array(1.0, 2.0))).toDF("id", "vec"))
    Whitening.fit(ragged, "vec", d).mean.zip(m1.mean).foreach {
      case (a, b) => math.abs(a - b) should be < 1e-12
    }
    val out = Whitening.whiten(ragged, "vec", m1)
    out.filter(col("id") === 9999L && col("vec").isNull).count() shouldBe 1L
    out.filter(col("vec").isNull).count() shouldBe 1L
    // < 2 usable vectors → loud refusal, not a degenerate divide
    intercept[IllegalArgumentException] {
      Whitening.fit(Seq((1L, Array.fill(d)(1.0))).toDF("id", "vec"),
        "vec", d)
    }.getMessage should include(">= 2 vectors")
  }

  test("saveModel/loadModel roundtrip is exact; empty/ragged artifacts refused") {
    val df = corpus(100)
    val model = Whitening.fit(df, "vec", d)
    val dir = java.nio.file.Files.createTempDirectory("graft-wmodel")
      .toString + "/model"
    Whitening.saveModel(spark, model, dir)
    val back = Whitening.loadModel(spark, dir)
    back.mean.toSeq shouldBe model.mean.toSeq        // bit-exact roundtrip
    back.lambda.toSeq shouldBe model.lambda.toSeq
    back.u.map(_.toSeq).toSeq shouldBe model.u.map(_.toSeq).toSeq
    // applying the loaded model is byte-identical to the fitted one
    gather(Whitening.whiten(df, "vec", back)).map(_.toSeq) shouldBe
      gather(Whitening.whiten(df, "vec", model)).map(_.toSeq)
    // a sliced artifact (missing component) refuses loud
    val sliced = dir + "_sliced"
    spark.read.parquet(dir)
      .filter(col("component") =!= 2).write.parquet(sliced)
    intercept[IllegalArgumentException] {
      Whitening.loadModel(spark, sliced)
    }.getMessage should include("gaps")
  }

  test("jacobiEigen: known symmetric eigensystems, A v = lambda v") {
    // block: [[2,1],[1,2]] (eigenvalues 3, 1) ⊕ [5]
    val a = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 2.0, 0.0),
      Array(0.0, 0.0, 5.0))
    val (lambda, u) = Whitening.jacobiEigen(a)
    lambda.zip(Seq(5.0, 3.0, 1.0)).foreach { case (got, want) =>
      math.abs(got - want) should be < 1e-10
    }
    // each eigenvector row satisfies A v = lambda v, unit norm
    (0 until 3).foreach { k =>
      val v = u(k)
      math.abs(v.map(x => x * x).sum - 1.0) should be < 1e-10
      (0 until 3).foreach { i =>
        val av = (0 until 3).map(j => a(i)(j) * v(j)).sum
        math.abs(av - lambda(k) * v(i)) should be < 1e-9
      }
    }
  }
}
