package graft.model

import scala.util.Random

/** The patient-embedding MLP (similarity_search.py:22-47): per hidden
  * layer the reference stacks Linear → ReLU → Dropout(0.2) →
  * BatchNorm1d (in that order, similarity_search.py:33-38), then a final
  * Linear to the 128-dim embedding. 20 → 256 → 128 → 128.
  *
  * Training-mode parity: dropout masks (inverted, p = 0.2, seeded — the
  * torch reference is unseeded there) and batch-statistics BatchNorm
  * with running-stat tracking (momentum 0.1, eps 1e-5, torch defaults)
  * are applied in [[localFit]]; at inference dropout is identity and BN
  * uses the running stats, exactly torch `eval()` semantics. Plain
  * Linear+ReLU nets (`bn = None`) remain supported for the hand-checked
  * spec nets.
  *
  * All math is plain double arrays with while-loops — this runs inside
  * executor tasks (one local model per shard), so no Spark types here.
  */
object Mlp {

  val dims: Vector[Int] = Vector(20, 256, 128, 128)
  val dropoutP: Double = 0.2
  val bnEps: Double = 1e-5
  val bnMomentum: Double = 0.1

  /** BatchNorm1d state for the hidden layers: learned scale/shift and
    * tracked running statistics (all shipped through FedAvg, as a
    * state_dict-shipping FL client does).
    */
  final case class Bn(gamma: Vector[Array[Double]], beta: Vector[Array[Double]],
                      runMean: Vector[Array[Double]], runVar: Vector[Array[Double]])

  /** Dense weights: per layer, W is (out × in) row-major, b is (out);
    * `bn` carries the hidden layers' BatchNorm state (None = plain
    * Linear+ReLU net, used by the tiny spec nets).
    */
  final case class Weights(w: Vector[Array[Array[Double]]], b: Vector[Array[Double]],
                           bn: Option[Bn] = None) {
    def nLayers: Int = w.length

    def flatten: Array[Double] = {
      val out = Array.newBuilder[Double]
      w.indices.foreach { l =>
        w(l).foreach(row => out ++= row)
        out ++= b(l)
      }
      bn.foreach { s =>
        s.gamma.indices.foreach { l =>
          out ++= s.gamma(l); out ++= s.beta(l)
          out ++= s.runMean(l); out ++= s.runVar(l)
        }
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
    // BN state for the hidden layers follows the linear stack
    val g = Vector.newBuilder[Array[Double]]
    val be = Vector.newBuilder[Array[Double]]
    val rm = Vector.newBuilder[Array[Double]]
    val rv = Vector.newBuilder[Array[Double]]
    (1 until dims.length - 1).foreach { l =>
      val d = dims(l)
      Seq(g, be, rm, rv).foreach { bld =>
        val v = new Array[Double](d)
        System.arraycopy(flat, off, v, 0, d); off += d
        bld += v
      }
    }
    Weights(ws.result(), bs.result(),
      Some(Bn(g.result(), be.result(), rm.result(), rv.result())))
  }

  /** Seeded init, torch defaults: Linear W, b ~ U(-k, k) with
    * k = 1/sqrt(fan_in); BatchNorm γ = 1, β = 0, running mean 0 / var 1
    * (M1, similarity_search.py:25-44 — torch init is unseeded there; we
    * seed for reproducibility).
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
    val hidden = dims.slice(1, dims.length - 1)
    Weights(ws.result(), bs.result(), Some(Bn(
      hidden.map(d => Array.fill(d)(1.0)),
      hidden.map(d => new Array[Double](d)),
      hidden.map(d => new Array[Double](d)),
      hidden.map(d => Array.fill(d)(1.0)))))
  }

  /** Inference forward pass (M4): per hidden layer affine + ReLU
    * (+ eval-mode BatchNorm over running stats when present; dropout is
    * identity in eval), final affine linear. Input/output float32 at the
    * boundary (reference uses float32 end-to-end,
    * similarity_search.py:195, 506).
    */
  def forward(wts: Weights, x: Array[Float]): Array[Float] = {
    var h = x.map(_.toDouble)
    var l = 0
    while (l < wts.nLayers) {
      val (wM, bV) = (wts.w(l), wts.b(l))
      val out = new Array[Double](bV.length)
      val hidden = l < wts.nLayers - 1
      var i = 0
      while (i < out.length) {
        val row = wM(i)
        var s = bV(i)
        var j = 0
        while (j < row.length) { s += row(j) * h(j); j += 1 }
        out(i) = if (hidden && s < 0) 0.0 else s // ReLU on hidden
        i += 1
      }
      if (hidden) wts.bn.foreach { bn =>
        val (ga, be) = (bn.gamma(l), bn.beta(l))
        val (rm, rv) = (bn.runMean(l), bn.runVar(l))
        var i2 = 0
        while (i2 < out.length) {
          out(i2) = ga(i2) * (out(i2) - rm(i2)) / math.sqrt(rv(i2) + bnEps) + be(i2)
          i2 += 1
        }
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
    // BN state averages like every other state_dict entry (what a
    // parameter-shipping FL client does with running stats)
    val accBn = shape.bn.map(s => Bn(
      s.gamma.map(v => new Array[Double](v.length)),
      s.beta.map(v => new Array[Double](v.length)),
      s.runMean.map(v => new Array[Double](v.length)),
      s.runVar.map(v => new Array[Double](v.length))))
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
      (accBn, wts.bn) match {
        case (Some(acc), Some(src)) =>
          def add(dst: Vector[Array[Double]], s: Vector[Array[Double]]): Unit =
            dst.indices.foreach { l =>
              var i = 0
              while (i < dst(l).length) { dst(l)(i) += s(l)(i) * weight; i += 1 }
            }
          add(acc.gamma, src.gamma); add(acc.beta, src.beta)
          add(acc.runMean, src.runMean); add(acc.runVar, src.runVar)
        case _ => ()
      }
    }
    Weights(accW, accB, accBn)
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
    // flatten interleaves γ, β, runMean, runVar per hidden layer
    val bn = shape.bn.map { s =>
      val hidden = s.gamma.indices
      val fields = Array.fill(4)(Array.ofDim[Array[Double]](hidden.length))
      hidden.foreach { l =>
        val d = s.gamma(l).length
        fields.foreach { arr =>
          val r = new Array[Double](d)
          System.arraycopy(flat, off, r, 0, d); off += d
          arr(l) = r
        }
      }
      Bn(fields(0).toVector, fields(1).toVector, fields(2).toVector, fields(3).toVector)
    }
    Weights(ws.result(), bs.result(), bn)
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
    * Hidden-layer train stack when `start.bn` is present — EXACTLY the
    * reference's module order (similarity_search.py:33-38):
    * Linear → ReLU → Dropout(0.2, inverted, seeded) → BatchNorm1d
    * (batch stats; running stats tracked with momentum 0.1; γ/β learned
    * under the same Adam). Plain Linear→ReLU when `bn` is None (spec
    * nets). Batches of size 1 skip BN (torch raises there; our shards
    * never produce them — documented degenerate case).
    *
    * Gradient: with D = E·Eᵀ − X·Xᵀ (symmetric, b×b), MSE over b² entries
    * gives dL/dE = (4/b²)·D·E, then standard backprop through
    * BN → dropout mask → ReLU → affine per hidden layer. Returns
    * (weights, per-epoch mean losses).
    */
  def localFit(start: Weights, data: Array[Array[Double]], epochs: Int = 5,
               batchSize: Int = 32, lr: Double = 1e-3,
               dropout: Double = dropoutP,
               dropoutSeed: Long = 42L): (Weights, Array[Double]) = {
    val n = data.length
    if (n == 0) return (start, Array.empty)
    val bs = math.min(batchSize, n)
    val nBatches = math.max(n / bs, 1)

    // deep-copy working weights (shape-agnostic — works for test nets too)
    val wts = Weights(start.w.map(_.map(_.clone())), start.b.map(_.clone()),
      start.bn.map(s => Bn(s.gamma.map(_.clone()), s.beta.map(_.clone()),
        s.runMean.map(_.clone()), s.runVar.map(_.clone()))))
    val nL = wts.nLayers
    val useBn = wts.bn.isDefined
    val p = if (useBn) dropout else 0.0
    val dropRng = new Random(dropoutSeed)

    // Adam state (linear + BN scale/shift)
    val mW = wts.w.map(m => Array.ofDim[Double](m.length, m(0).length))
    val vW = wts.w.map(m => Array.ofDim[Double](m.length, m(0).length))
    val mB = wts.b.map(v => new Array[Double](v.length))
    val vB = wts.b.map(v => new Array[Double](v.length))
    val mG = wts.bn.map(s => s.gamma.map(v => new Array[Double](v.length)))
    val vG = wts.bn.map(s => s.gamma.map(v => new Array[Double](v.length)))
    val mBe = wts.bn.map(s => s.beta.map(v => new Array[Double](v.length)))
    val vBe = wts.bn.map(s => s.beta.map(v => new Array[Double](v.length)))
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
        val bnActive = useBn && b >= 2

        // forward, keeping per-stage activations:
        // acts(l) = input to layer l; for hidden layers also cache the
        // post-ReLU activation, dropout mask, BN xhat and invStd
        val acts = new Array[Array[Array[Double]]](nL + 1)
        val reluOut = new Array[Array[Array[Double]]](nL)   // a = relu(z)
        val dropMask = new Array[Array[Array[Double]]](nL)  // inverted mask
        val xhat = new Array[Array[Array[Double]]](nL)
        val invStd = new Array[Array[Double]](nL)
        acts(0) = x
        var l = 0
        while (l < nL) {
          val (wM, bV) = (wts.w(l), wts.b(l))
          val hidden = l < nL - 1
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
              out(r)(i) = if (hidden && s < 0) 0.0 else s
              i += 1
            }
            r += 1
          }
          if (hidden && useBn) {
            reluOut(l) = out.map(_.clone())
            // inverted dropout
            val mask = Array.ofDim[Double](b, bV.length)
            if (p > 0) {
              val keep = 1.0 / (1.0 - p)
              var r2 = 0
              while (r2 < b) {
                var i2 = 0
                while (i2 < bV.length) {
                  mask(r2)(i2) = if (dropRng.nextDouble() >= p) keep else 0.0
                  out(r2)(i2) *= mask(r2)(i2)
                  i2 += 1
                }
                r2 += 1
              }
            } else {
              mask.foreach(row => java.util.Arrays.fill(row, 1.0))
            }
            dropMask(l) = mask
            if (bnActive) {
              val bn = wts.bn.get
              val (ga, be) = (bn.gamma(l), bn.beta(l))
              val (rm, rv) = (bn.runMean(l), bn.runVar(l))
              val dimL = bV.length
              val xh = Array.ofDim[Double](b, dimL)
              val istd = new Array[Double](dimL)
              var i2 = 0
              while (i2 < dimL) {
                var mu = 0.0
                var r2 = 0
                while (r2 < b) { mu += out(r2)(i2); r2 += 1 }
                mu /= b
                var va = 0.0
                r2 = 0
                while (r2 < b) { val dlt = out(r2)(i2) - mu; va += dlt * dlt; r2 += 1 }
                va /= b // biased var normalizes (torch)
                val is = 1.0 / math.sqrt(va + bnEps)
                istd(i2) = is
                r2 = 0
                while (r2 < b) {
                  xh(r2)(i2) = (out(r2)(i2) - mu) * is
                  out(r2)(i2) = ga(i2) * xh(r2)(i2) + be(i2)
                  r2 += 1
                }
                // running stats: momentum 0.1, unbiased var (torch)
                rm(i2) = (1 - bnMomentum) * rm(i2) + bnMomentum * mu
                rv(i2) = (1 - bnMomentum) * rv(i2) +
                  bnMomentum * va * b / (b - 1.0)
                i2 += 1
              }
              xhat(l) = xh
              invStd(l) = istd
            }
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
          if (l < nL - 1) {
            if (useBn) {
              // backward through BN (if active this batch), then the
              // dropout mask, then the ReLU gate
              if (bnActive) {
                val bn = wts.bn.get
                val (ga, xh, istd) = (bn.gamma(l), xhat(l), invStd(l))
                var i = 0
                while (i < outDim) {
                  var dG = 0.0; var dBe = 0.0
                  var sumDxhat = 0.0; var sumDxhatXhat = 0.0
                  var rr = 0
                  while (rr < b) {
                    val dy = grad(rr)(i)
                    dG += dy * xh(rr)(i)
                    dBe += dy
                    val dxh = dy * ga(i)
                    sumDxhat += dxh
                    sumDxhatXhat += dxh * xh(rr)(i)
                    rr += 1
                  }
                  // d(dropped input) per row
                  rr = 0
                  while (rr < b) {
                    val dxh = grad(rr)(i) * ga(i)
                    grad(rr)(i) = istd(i) / b *
                      (b * dxh - sumDxhat - xh(rr)(i) * sumDxhatXhat)
                    rr += 1
                  }
                  // Adam on γ/β
                  val mg = mG.get(l)(i) * beta1 + (1 - beta1) * dG
                  val vg = vG.get(l)(i) * beta2 + (1 - beta2) * dG * dG
                  mG.get(l)(i) = mg; vG.get(l)(i) = vg
                  ga(i) -= lr * (mg / bc1) / (math.sqrt(vg / bc2) + eps)
                  val mb = mBe.get(l)(i) * beta1 + (1 - beta1) * dBe
                  val vb = vBe.get(l)(i) * beta2 + (1 - beta2) * dBe * dBe
                  mBe.get(l)(i) = mb; vBe.get(l)(i) = vb
                  bn.beta(l)(i) -= lr * (mb / bc1) / (math.sqrt(vb / bc2) + eps)
                  i += 1
                }
              }
              // dropout mask, then ReLU gate on the PRE-dropout activation
              val (a, mask) = (reluOut(l), dropMask(l))
              var rr = 0
              while (rr < b) {
                var i = 0
                while (i < outDim) {
                  grad(rr)(i) *= mask(rr)(i)
                  if (a(rr)(i) <= 0.0) grad(rr)(i) = 0.0
                  i += 1
                }
                rr += 1
              }
            } else {
              // plain net: ReLU mask (out==0 ⇒ grad 0)
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

  /** Train-mode loss (batch-stats BN, dropout DISABLED) of one batch —
    * the differentiable function [[localFit]] optimizes when p = 0; used
    * by the numerical gradient check for the BN path. Does not mutate
    * running stats.
    */
  def trainingLossOf(wts: Weights, x: Array[Array[Double]]): Double = {
    val b = x.length
    val nL = wts.nLayers
    var acts: Array[Array[Double]] = x
    var l = 0
    while (l < nL) {
      val (wM, bV) = (wts.w(l), wts.b(l))
      val hidden = l < nL - 1
      val out = Array.ofDim[Double](b, bV.length)
      var r = 0
      while (r < b) {
        val in = acts(r)
        var i = 0
        while (i < bV.length) {
          val row = wM(i)
          var s = bV(i)
          var j = 0
          while (j < row.length) { s += row(j) * in(j); j += 1 }
          out(r)(i) = if (hidden && s < 0) 0.0 else s
          i += 1
        }
        r += 1
      }
      if (hidden && wts.bn.isDefined && b >= 2) {
        val bn = wts.bn.get
        val (ga, be) = (bn.gamma(l), bn.beta(l))
        var i = 0
        while (i < bV.length) {
          var mu = 0.0
          var r2 = 0
          while (r2 < b) { mu += out(r2)(i); r2 += 1 }
          mu /= b
          var va = 0.0
          r2 = 0
          while (r2 < b) { val dlt = out(r2)(i) - mu; va += dlt * dlt; r2 += 1 }
          va /= b
          val is = 1.0 / math.sqrt(va + bnEps)
          r2 = 0
          while (r2 < b) {
            out(r2)(i) = ga(i) * (out(r2)(i) - mu) * is + be(i)
            r2 += 1
          }
          i += 1
        }
      }
      acts = out
      l += 1
    }
    val emb = acts
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
}
