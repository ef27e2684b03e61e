package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding whitening and PCA projection — the standard
  * post-processing that removes anisotropy from embedding spaces
  * before cosine retrieval / near-dup screening (Su et al.,
  * "Whitening Sentence Representations for Better Semantics and
  * Faster Retrieval", 2021 — public literature) and the dim-reduction
  * step long pipelines put in front of ANN indexes.
  *
  * Scale shape: `fit` is ONE aggregation over the corpus — the
  * [[graft.functions.VectorMoments]] state (count + Σx + upper-tri
  * Σx·xᵀ) is a fixed-size record map-side combined next to the scan,
  * so 100 TB of vectors funnel into one d(d+3)/2-double partial per
  * task and ONE driver row. The d×d eigendecomposition runs on the
  * DRIVER (cyclic Jacobi — d ≤ 1024 by [[graft.functions
  * .VectorMoments]]'s cap, milliseconds at embedding dims), exactly
  * like the k-means/PQ codebook trainers keep their tiny dense math
  * driver-side. `whiten`/`pcaProject` apply as ONE codegen'd native
  * expression per row ([[graft.functions.WhitenVector]] — the matrix
  * rides as a codegen reference object, the NearestCentroids
  * pattern): a narrow map, no shuffle, no UDF.
  *
  * Determinism: like the k-means trainer, the fitted model carries
  * double-sum rounding (aggregation merge order varies with
  * partitioning), so fits are reproducible to float tolerance, not
  * bit-exact — gate queries over this operator are rows-only with the
  * real bounds spec-pinned (WhiteningSpec: whitened covariance ≈ I to
  * 1e-6 on the fitted corpus, PCA captures the planted dominant
  * directions).
  */
object Whitening {

  /** Fitted moments: `mean`, eigenvalues `lambda` (descending) and
    * matching eigenVECTORS as ROWS of `u` (u(k) is the k-th
    * component), of the sample covariance. */
  final case class Model(mean: Array[Double], lambda: Array[Double],
                         u: Array[Array[Double]]) {
    require(mean.nonEmpty && lambda.length == mean.length &&
      u.length == mean.length, "inconsistent model shapes")

    /** ZCA whitening map W = U diag(1/√(λ+eps)) Uᵀ — symmetric, stays
      * in the original coordinates (the "looks like the input" whiten
      * retrieval pipelines prefer). */
    def zcaMatrix(eps: Double): Array[Array[Double]] = {
      val d = mean.length
      val scale = lambda.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
      // W_ij = Σ_k u(k)(i) · scale(k) · u(k)(j)
      Array.tabulate(d, d) { (i, j) =>
        var s = 0.0
        var k = 0
        while (k < d) { s += u(k)(i) * scale(k) * u(k)(j); k += 1 }
        s
      }
    }

    /** PCA projection map: rows k < `k` of U, each scaled by
      * 1/√(λ_k+eps) when `whitened` (so projected components have
      * ~unit variance on the fitted corpus). */
    def pcaMatrix(k: Int, whitened: Boolean,
                  eps: Double): Array[Array[Double]] = {
      require(k >= 1 && k <= mean.length,
        s"k must be in 1..${mean.length}, got $k")
      Array.tabulate(k, mean.length) { (r, c) =>
        val s = if (whitened)
          1.0 / math.sqrt(math.max(lambda(r), 0.0) + eps)
        else 1.0
        u(r)(c) * s
      }
    }
  }

  private def asDoubleVec(c: Column): Column = c.cast("array<double>")

  /** Fit mean + covariance eigenstructure over `vecCol` (any numeric
    * array column; cast internally). ONE aggregation job + a driver
    * Jacobi sweep. Vectors whose length ≠ `dim` are skipped (the
    * vector-aggregate convention); refuses loud when fewer than 2
    * valid vectors contributed (a covariance of one point is zero —
    * whitening it would divide by eps alone and explode the output).
    */
  def fit(df: DataFrame, vecCol: String, dim: Int): Model = {
    val packed = df.agg(graft.functions.VectorFunctions
      .vectorMoments(asDoubleVec(col(vecCol)), dim).as("m")).collect()(0)
    require(!packed.isNullAt(0),
      s"Whitening.fit: no valid $dim-length vectors in '$vecCol'")
    val m = packed.getSeq[Double](0).toArray
    val n = m(0)
    require(n >= 2.0,
      s"Whitening.fit: need >= 2 vectors, got ${n.toLong}")
    val mean = Array.tabulate(dim)(i => m(1 + i) / n)
    // covariance from raw moments: C_ij = Σxᵢxⱼ/n − μᵢμⱼ
    val cov = Array.ofDim[Double](dim, dim)
    var k = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = m(k) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; k += 1
      }
      i += 1
    }
    val (lambda, u) = jacobiEigen(cov)
    Model(mean, lambda, u)
  }

  /** ZCA-whiten `vecCol` in place (same name, `array<double>`): one
    * codegen'd narrow map. `eps` regularizes near-zero directions. */
  def whiten(df: DataFrame, vecCol: String, model: Model,
             eps: Double = 1e-9): DataFrame =
    df.withColumn(vecCol, graft.functions.HashFunctions.whitenVector(
      asDoubleVec(col(vecCol)), model.mean, model.zcaMatrix(eps)))

  /** Project `vecCol` onto the top-`k` principal components (output
    * length k, replacing the column); `whitened = true` scales each
    * component to ~unit variance on the fitted corpus. */
  def pcaProject(df: DataFrame, vecCol: String, model: Model, k: Int,
                 whitened: Boolean = false,
                 eps: Double = 1e-9): DataFrame =
    df.withColumn(vecCol, graft.functions.HashFunctions.whitenVector(
      asDoubleVec(col(vecCol)), model.mean,
      model.pcaMatrix(k, whitened, eps)))

  /** Persist a fitted model as a (component, eigenvalue, mean_i,
    * vector) parquet — the model artifact of a standing whitening map
    * (fit once on the corpus, apply in every downstream job; the
    * savePqCodebooks / LinearModel.saveWeightsQ discipline). One row
    * per component, driver-sized. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                path: String): Unit = {
    import spark.implicits._
    model.lambda.indices.map { k =>
      (k, model.lambda(k), model.mean(k), model.u(k).toSeq)
    }.toDF("component", "eigenvalue", "mean_i", "vector")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a model saved by [[saveModel]]; shape-validated loud. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Model = {
    val rows = spark.read.parquet(path)
      .select(col("component").cast("int"), col("eigenvalue"),
        col("mean_i"), col("vector"))
      .collect()
      .sortBy(_.getInt(0))
    require(rows.nonEmpty, s"no whitening model at $path")
    val d = rows.length
    require(rows.map(_.getInt(0)).toSeq == (0 until d),
      s"whitening model at $path has gaps in its component ids")
    val m = Model(
      mean = rows.map(_.getDouble(2)),
      lambda = rows.map(_.getDouble(1)),
      u = rows.map(_.getSeq[Double](3).toArray))
    require(m.u.forall(_.length == d),
      s"whitening model at $path has ragged eigenvectors")
    m
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — the
    * classical O(d³)-per-sweep rotation scheme (Golub & Van Loan §8.5,
    * public literature), deterministic: fixed (p,q) sweep order, fixed
    * convergence threshold, ≤ 64 sweeps (embedding-dim matrices
    * converge in < 15). Returns (eigenvalues DESC, matching
    * eigenvectors as rows), ties broken by the rotation history —
    * stable for a given input matrix. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-12 * math.max(1.0, frobenius(a))
    while (off > tol && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / (d * d)) {
            // standard symmetric Schur rotation
            val tau = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(tau) match {
              case 0.0 => 1.0 / (tau + math.sqrt(1.0 + tau * tau))
              case s   => s / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
            }
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray, order.map(i => v(i).clone()).toArray)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
