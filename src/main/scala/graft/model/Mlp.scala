package graft.model

import scala.util.Random

/** The patient-embedding MLP (similarity_search.py:22-47): 20 → 256 → 128
  * → 128-dim embedding, ReLU hidden activations.
  *
  * Architecture deviations from the torch reference, both behavioral
  * no-ops at inference (SURVEY.md §2.8 V4, §7 step 6 scopes training to
  * behavioral — not bit — parity):
  *  - Dropout(0.2) is identity in eval mode → omitted.
  *  - BatchNorm1d with untrained running stats (mean 0, var 1) is ≈
  *    identity; the reference never launches a real FL server and its
  *    training is unseeded/irreproducible, so we define our hidden layer
  *    as Linear+ReLU and train that.
  *
  * All math is plain double arrays with while-loops — this runs inside
  * executor tasks (one local model per shard), so no Spark types here.
  */
object Mlp {

  val dims: Vector[Int] = Vector(20, 256, 128, 128)

  /** Dense weights: per layer, W is (out × in) row-major, b is (out). */
  final case class Weights(w: Vector[Array[Array[Double]]], b: Vector[Array[Double]]) {
    def nLayers: Int = w.length

    def flatten: Array[Double] = {
      val out = Array.newBuilder[Double]
      w.indices.foreach { l =>
        w(l).foreach(row => out ++= row)
        out ++= b(l)
      }
      out.result()
    }
  }

  def unflatten(flat: Array[Double]): Weights = {
    var off = 0
    val ws = Vector.newBuilder[Array[Array[Double]]]
    val bs = Vector.newBuilder[Array[Double]]
    (0 until dims.length - 1).foreach { l =>
      val (in, out) = (dims(l), dims(l + 1))
      val wMat = Array.ofDim[Double](out, in)
      var i = 0
      while (i < out) {
        System.arraycopy(flat, off, wMat(i), 0, in); off += in; i += 1
      }
      val bVec = new Array[Double](out)
      System.arraycopy(flat, off, bVec, 0, out); off += out
      ws += wMat; bs += bVec
    }
    Weights(ws.result(), bs.result())
  }

  /** Seeded init, torch `nn.Linear` default scheme: W and b ~ U(-k, k),
    * k = 1/sqrt(fan_in) (M1, similarity_search.py:25-44 — torch init is
    * unseeded there; we seed for reproducibility).
    */
  def init(seed: Long = 42L): Weights = {
    val rng = new Random(seed)
    val ws = Vector.newBuilder[Array[Array[Double]]]
    val bs = Vector.newBuilder[Array[Double]]
    (0 until dims.length - 1).foreach { l =>
      val (in, out) = (dims(l), dims(l + 1))
      val k = 1.0 / math.sqrt(in.toDouble)
      ws += Array.fill(out, in)((rng.nextDouble() * 2 - 1) * k)
      bs += Array.fill(out)((rng.nextDouble() * 2 - 1) * k)
    }
    Weights(ws.result(), bs.result())
  }

  /** Inference forward pass (M4): affine + ReLU on hidden layers, final
    * affine linear. Input/output float32 at the boundary (reference uses
    * float32 end-to-end, similarity_search.py:195, 506).
    */
  def forward(wts: Weights, x: Array[Float]): Array[Float] = {
    var h = x.map(_.toDouble)
    var l = 0
    while (l < wts.nLayers) {
      val (wM, bV) = (wts.w(l), wts.b(l))
      val out = new Array[Double](bV.length)
      var i = 0
      while (i < out.length) {
        val row = wM(i)
        var s = bV(i)
        var j = 0
        while (j < row.length) { s += row(j) * h(j); j += 1 }
        out(i) = if (l < wts.nLayers - 1 && s < 0) 0.0 else s // ReLU on hidden
        i += 1
      }
      h = out
      l += 1
    }
    h.map(_.toFloat)
  }

  /** A5 — FedAvg: weight = n_k / Σn (similarity_search.py:476-493).
    * Shape-agnostic (accumulates into the first client's shape).
    */
  def fedAvg(results: Seq[(Weights, Long)]): Weights = {
    require(results.nonEmpty, "fedAvg of zero clients")
    val total = results.map(_._2).sum.toDouble
    val shape = results.head._1
    val accW = shape.w.map(m => Array.ofDim[Double](m.length, m(0).length))
    val accB = shape.b.map(v => new Array[Double](v.length))
    results.foreach { case (wts, n) =>
      val weight = n / total
      accW.indices.foreach { l =>
        var i = 0
        while (i < accW(l).length) {
          val src = wts.w(l)(i); val dst = accW(l)(i)
          var j = 0
          while (j < dst.length) { dst(j) += src(j) * weight; j += 1 }
          i += 1
        }
        val srcB = wts.b(l); val dstB = accB(l)
        var k = 0
        while (k < dstB.length) { dstB(k) += srcB(k) * weight; k += 1 }
      }
    }
    Weights(accW, accB)
  }

  /** Rebuild weights of an arbitrary shape from a flat vector (inverse of
    * `flatten` for non-production dims; `unflatten` covers the standard
    * net).
    */
  def unflattenLike(shape: Weights, flat: Array[Double]): Weights = {
    var off = 0
    val ws = Vector.newBuilder[Array[Array[Double]]]
    val bs = Vector.newBuilder[Array[Double]]
    shape.w.indices.foreach { l =>
      ws += shape.w(l).map { row =>
        val r = new Array[Double](row.length)
        System.arraycopy(flat, off, r, 0, row.length); off += row.length
        r
      }
      val bv = new Array[Double](shape.b(l).length)
      System.arraycopy(flat, off, bv, 0, bv.length); off += bv.length
      bs += bv
    }
    Weights(ws.result(), bs.result())
  }

  /** Gram-reconstruction loss of a batch under given weights (V5,
    * similarity_search.py:236-238) — exposed for the numerical gradient
    * check in MlpSpec and for loss inspection.
    */
  def lossOf(wts: Weights, x: Array[Array[Double]]): Double = {
    val b = x.length
    val emb = x.map(row => forward(wts, row.map(_.toFloat)).map(_.toDouble))
    val d = emb(0).length
    var loss = 0.0
    var r = 0
    while (r < b) {
      var c = 0
      while (c < b) {
        var re = 0.0; var rx = 0.0
        var j = 0
        while (j < d) { re += emb(r)(j) * emb(c)(j); j += 1 }
        j = 0
        while (j < x(0).length) { rx += x(r)(j) * x(c)(j); j += 1 }
        val dd = re - rx
        loss += dd * dd
        c += 1
      }
      r += 1
    }
    loss / (b.toDouble * b)
  }

  /** M2 — local minibatch training with the Gram-reconstruction loss
    * `L = MSE(E·Eᵀ, X·Xᵀ)` (similarity_search.py:236-238) under Adam
    * (lr 1e-3, similarity_search.py:177). Batching mirrors the reference:
    * sequential slices of size min(32, n), n/batch full batches, no
    * inter-epoch shuffle (similarity_search.py:220-228).
    *
    * Gradient: with D = E·Eᵀ − X·Xᵀ (symmetric, b×b), MSE over b² entries
    * gives dL/dE = (4/b²)·D·E, then standard backprop through the ReLU
    * stack. Returns (weights, per-epoch mean losses).
    */
  def localFit(start: Weights, data: Array[Array[Double]], epochs: Int = 5,
               batchSize: Int = 32, lr: Double = 1e-3): (Weights, Array[Double]) = {
    val n = data.length
    if (n == 0) return (start, Array.empty)
    val bs = math.min(batchSize, n)
    val nBatches = math.max(n / bs, 1)

    // deep-copy working weights (shape-agnostic — works for test nets too)
    val wts = Weights(start.w.map(_.map(_.clone())), start.b.map(_.clone()))
    val nL = wts.nLayers

    // Adam state
    val mW = wts.w.map(m => Array.ofDim[Double](m.length, m(0).length))
    val vW = wts.w.map(m => Array.ofDim[Double](m.length, m(0).length))
    val mB = wts.b.map(v => new Array[Double](v.length))
    val vB = wts.b.map(v => new Array[Double](v.length))
    val (beta1, beta2, eps) = (0.9, 0.999, 1e-8)
    var t = 0

    val epochLosses = new Array[Double](epochs)
    var e = 0
    while (e < epochs) {
      var epochLoss = 0.0
      var bi = 0
      while (bi < nBatches) {
        val x = data.slice(bi * bs, math.min((bi + 1) * bs, n))
        val b = x.length

        // forward, keeping activations: a(0)=x, a(l+1)=layer_l output
        val acts = new Array[Array[Array[Double]]](nL + 1)
        acts(0) = x
        var l = 0
        while (l < nL) {
          val (wM, bV) = (wts.w(l), wts.b(l))
          val out = Array.ofDim[Double](b, bV.length)
          var r = 0
          while (r < b) {
            val in = acts(l)(r)
            var i = 0
            while (i < bV.length) {
              val row = wM(i)
              var s = bV(i)
              var j = 0
              while (j < row.length) { s += row(j) * in(j); j += 1 }
              out(r)(i) = if (l < nL - 1 && s < 0) 0.0 else s
              i += 1
            }
            r += 1
          }
          acts(l + 1) = out
          l += 1
        }

        // loss & dL/dE
        val emb = acts(nL)
        val d = emb(0).length
        // D = E·Eᵀ − X·Xᵀ  (b×b)
        val diff = Array.ofDim[Double](b, b)
        var loss = 0.0
        var r = 0
        while (r < b) {
          var c = 0
          while (c < b) {
            var re = 0.0; var rx = 0.0
            var j = 0
            while (j < d) { re += emb(r)(j) * emb(c)(j); j += 1 }
            j = 0
            while (j < x(0).length) { rx += x(r)(j) * x(c)(j); j += 1 }
            val dd = re - rx
            diff(r)(c) = dd
            loss += dd * dd
            c += 1
          }
          r += 1
        }
        loss /= (b.toDouble * b)
        epochLoss += loss

        // grad wrt embeddings: (4/b²)·D·E
        val scale = 4.0 / (b.toDouble * b)
        var grad = Array.ofDim[Double](b, d)
        r = 0
        while (r < b) {
          var j = 0
          while (j < d) {
            var s = 0.0
            var c = 0
            while (c < b) { s += diff(r)(c) * emb(c)(j); c += 1 }
            grad(r)(j) = s * scale
            j += 1
          }
          r += 1
        }

        // backprop + Adam update
        t += 1
        val bc1 = 1 - math.pow(beta1, t)
        val bc2 = 1 - math.pow(beta2, t)
        l = nL - 1
        while (l >= 0) {
          val in = acts(l)
          val out = acts(l + 1)
          val (wM, bV) = (wts.w(l), wts.b(l))
          val inDim = wM(0).length
          val outDim = bV.length
          // ReLU mask for hidden layers (out==0 ⇒ grad 0)
          if (l < nL - 1) {
            var rr = 0
            while (rr < grad.length) {
              var i = 0
              while (i < outDim) {
                if (out(rr)(i) <= 0.0) grad(rr)(i) = 0.0
                i += 1
              }
              rr += 1
            }
          }
          // grads: dW(i,j) = Σ_r grad(r,i)·in(r,j); db(i) = Σ_r grad(r,i)
          // next grad: dIn(r,j) = Σ_i grad(r,i)·W(i,j)  (pre-update W)
          val nextGrad = if (l > 0) Array.ofDim[Double](grad.length, inDim) else null
          var i = 0
          while (i < outDim) {
            val wRow = wM(i)
            var gB = 0.0
            var rr = 0
            while (rr < grad.length) {
              val g = grad(rr)(i)
              gB += g
              if (l > 0) {
                val ng = nextGrad(rr)
                var j = 0
                while (j < inDim) { ng(j) += g * wRow(j); j += 1 }
              }
              rr += 1
            }
            var j = 0
            while (j < inDim) {
              var gW = 0.0
              rr = 0
              while (rr < grad.length) { gW += grad(rr)(i) * in(rr)(j); rr += 1 }
              val m = mW(l)(i)(j) * beta1 + (1 - beta1) * gW
              val v = vW(l)(i)(j) * beta2 + (1 - beta2) * gW * gW
              mW(l)(i)(j) = m; vW(l)(i)(j) = v
              wRow(j) -= lr * (m / bc1) / (math.sqrt(v / bc2) + eps)
              j += 1
            }
            val m = mB(l)(i) * beta1 + (1 - beta1) * gB
            val v = vB(l)(i) * beta2 + (1 - beta2) * gB * gB
            mB(l)(i) = m; vB(l)(i) = v
            bV(i) -= lr * (m / bc1) / (math.sqrt(v / bc2) + eps)
            i += 1
          }
          if (l > 0) grad = nextGrad
          l -= 1
        }
        bi += 1
      }
      epochLosses(e) = epochLoss / nBatches
      e += 1
    }
    (wts, epochLosses)
  }
}
