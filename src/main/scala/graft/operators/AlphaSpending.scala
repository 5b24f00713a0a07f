package graft.operators

/** Lan-DeMets alpha-spending boundaries (Lan & DeMets '83,
  * "Discrete sequential boundaries for clinical trials") — the
  * generalization the OBF/Pocock pair ([[Events.groupSequentialObf]])
  * points at: instead of a fixed boundary SHAPE, the designer fixes a
  * cumulative type-I-error spending function α*(t) over information
  * time t ∈ (0, 1], and the per-look critical values u_k are whatever
  * makes the cumulative crossing probability equal α*(t_k) exactly.
  * The K-look boundary then stays valid for ANY schedule of looks —
  * the property that made spending functions the production standard
  * over the original fixed-K designs.
  *
  * Numerics (driver-side, metadata-sized): the crossing probabilities
  * need the joint law of the partial-sum process S_k ~ N(0, t_k) with
  * independent increments; the standard Armitage-McPherson-Rowe
  * recursion carries the sub-density f_k of paths that survived looks
  * 1..k on a grid over the continuation region [-a_k, a_k]:
  *
  *   - look 1 is a closed form: a_1 = √t_1 · Φ⁻¹(1 − α*(t_1)/2);
  *   - at look k, the incremental crossing probability for a candidate
  *     bound a is ∫ f_{k-1}(x) · [1 − (Φ((a−x)/σ) − Φ((−a−x)/σ))] dx
  *     with σ = √Δt — the s-integral is exchanged into the normal CDF,
  *     so quadrature error comes only from the SMOOTH f_{k-1} on a
  *     grid whose endpoints sit exactly on ±a_{k-1} (the trick that
  *     makes 301 grid points reproduce the published tables to 4
  *     decimals, where naive two-dimensional trapezoid needs ~10⁴);
  *   - a_k solves incremental-spend = α*(t_k) − α*(t_{k-1}) by
  *     fixed-iteration-count bisection, then f_k is the convolution
  *     of f_{k-1} with the N(0, Δt) kernel re-gridded onto [-a_k, a_k].
  *
  * Every loop has a fixed order and iteration count, so the emitted
  * doubles are deterministic — FROZEN LITERALS the declared query and
  * its SQL oracle both embed (the PQ-codebook discipline): the engine
  * compares |z| against `element_at(lit(bounds), k)` and the oracle
  * against the same Double.toString round-tripped constants.
  *
  * Spending functions (two-sided symmetric, per-side level α/2 — the
  * convention of the published Lan-DeMets tables and of ldbounds/
  * gsDesign):
  *   - "obf":    α*(t) = 2·(2 − 2Φ(z_{α/4}/√t)) — near-unspendable
  *     early, ≈ O'Brien-Fleming shape (K=5, α=.05: 4.8769, 3.3570,
  *     2.6803, 2.2898, 2.0310);
  *   - "pocock": α*(t) = α·ln(1 + (e−1)·t) — near-linear spend,
  *     ≈ Pocock's flat boundary (K=5, α=.05: 2.4380, 2.4268, 2.4102,
  *     2.3966, 2.3860);
  *   - "hsd": the Hwang-Shih-DeCani γ family at γ=−4,
  *     α*(t) = α·(1−e^{−γt})/(1−e^{−γ}) — exponential back-loaded
  *     spend between the two shapes.
  *
  * Scale shape (100 TB): boundary computation touches no data at all —
  * O(K · gridN²) driver-side doubles; the monitor itself keeps the
  * groupSequentialObf shape (one map-side-combinable (look, arm)
  * aggregate, a K-row grid fold).
  */
object AlphaSpending {
  // The solvers are pure functions of their (few, enumerable) argument
  // tuples, but NOT cheap: futilityBoundaries runs a 60-step outer
  // bisection over a K-look Armitage recursion (~10^7 Phi calls, ~5 s
  // driver-side — measured as the whole cost of the declared futility
  // query at sf0.1). Every monitor construction re-solved it (Bench
  // re-builds the plan per iteration). Memoize per argument tuple —
  // driver-side, a handful of entries; computeIfAbsent gives per-key
  // locking (one slow futility solve must not serialize unrelated
  // lookups from Verify/Bench plan-builder threads), and the cached
  // value is deep-copied on the way out so a caller mutating a
  // returned Array cannot corrupt the cache.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, Seq[Any]), Any]
  private def defensiveCopy(v: Any): Any = v match {
    case a: Array[Double] => a.clone()
    case (u: Array[Double], l: Array[Double], d: Double) => (u.clone(), l.clone(), d)
    case other => other
  }
  private def memoized[T](key: (String, Seq[Any]))(body: => T): T =
    defensiveCopy(memo.computeIfAbsent(key, _ => body)).asInstanceOf[T]

  private val stdNormal =
    new org.apache.commons.math3.distribution.NormalDistribution(0.0, 1.0)
  private def Phi(x: Double): Double = stdNormal.cumulativeProbability(x)
  private def PhiInv(p: Double): Double = stdNormal.inverseCumulativeProbability(p)
  private def phi(x: Double): Double =
    math.exp(-x * x / 2.0) / math.sqrt(2.0 * math.Pi)

  /** Cumulative TWO-SIDED spend at information fraction t. */
  private def spendAt(t: Double, alpha: Double, spending: String): Double =
    spending match {
      case "obf" =>
        val zc = PhiInv(1.0 - alpha / 4.0)
        2.0 * (2.0 - 2.0 * Phi(zc / math.sqrt(t)))
      case "pocock" =>
        alpha * math.log(1.0 + (math.E - 1.0) * t)
      case "hsd" =>
        // Hwang-Shih-DeCani '90 gamma family at gamma = -4: the
        // textbook "conservative, OBF-like" member — exponential spend
        // alpha * (1 - e^{-gamma t}) / (1 - e^{-gamma}); gamma -> 0 is
        // linear (Pocock-like), NEGATIVE gamma back-loads the spend
        // (t=0.2 spends 2.3% of alpha vs pocock's 44%)
        val gamma = -4.0
        alpha * (1.0 - math.exp(-gamma * t)) / (1.0 - math.exp(-gamma))
      case other =>
        throw new IllegalArgumentException(
          s"AlphaSpending: spending must be 'obf', 'pocock' or 'hsd', got '$other'")
    }

  /** Two-sided symmetric Lan-DeMets boundaries u_1..u_K (z-scale) for
    * K equally-spaced looks at overall level `alpha`. Deterministic:
    * fixed grid size, fixed 100-step bisections.
    */
  def ldBoundaries(looks: Int, alpha: Double, spending: String,
      gridN: Int = 601): Array[Double] =
      memoized(("ld", Seq(looks, alpha, spending, gridN))) {
    require(looks >= 2, s"ldBoundaries: need looks>=2, got $looks")
    require(alpha > 0 && alpha < 1, s"ldBoundaries: need alpha in (0,1), got $alpha")
    require(gridN >= 51 && gridN % 2 == 1,
      s"ldBoundaries: need odd gridN>=51, got $gridN")
    val dt = 1.0 / looks
    val sig = math.sqrt(dt)
    val us = new Array[Double](looks)

    // look 1: S_1 ~ N(0, t_1), closed form
    val a1 = sig * PhiInv(1.0 - spendAt(dt, alpha, spending) / 2.0)
    us(0) = a1 / sig

    // sub-density of surviving paths on a grid with endpoints at ±a
    var a = a1
    var xs = Array.tabulate(gridN)(i => -a + 2.0 * a * i / (gridN - 1))
    var f = xs.map(x => phi(x / sig) / sig)
    var h = xs(1) - xs(0)

    var k = 2
    while (k <= looks) {
      val t = k * dt
      val targetInc = spendAt(t, alpha, spending) -
        spendAt((k - 1) * dt, alpha, spending)
      // P(cross at look k | bound b) via the exchanged-order integral
      def crossProb(b: Double): Double = {
        var tot = 0.0
        var i = 0
        while (i < gridN) {
          val w = if (i == 0 || i == gridN - 1) 0.5 else 1.0
          val surv = Phi((b - xs(i)) / sig) - Phi((-b - xs(i)) / sig)
          tot += w * f(i) * (1.0 - surv)
          i += 1
        }
        tot * h
      }
      var lo = 0.0; var hi = 10.0
      var it = 0
      while (it < 100) {
        val mid = (lo + hi) / 2.0
        if (crossProb(mid) > targetInc) lo = mid else hi = mid
        it += 1
      }
      a = (lo + hi) / 2.0
      us(k - 1) = a / math.sqrt(t)
      if (k < looks) {
        // f_k = (f_{k-1} * N(0, dt)) truncated, re-gridded onto [-a, a]
        val nxs = Array.tabulate(gridN)(i => -a + 2.0 * a * i / (gridN - 1))
        val nf = nxs.map { s =>
          var tot = 0.0
          var i = 0
          while (i < gridN) {
            val w = if (i == 0 || i == gridN - 1) 0.5 else 1.0
            tot += w * f(i) * phi((s - xs(i)) / sig) / sig
            i += 1
          }
          tot * h
        }
        xs = nxs; f = nf; h = xs(1) - xs(0)
      }
      k += 1
    }
    us
  }

  /** Cumulative ONE-SIDED spend at information fraction t, level a —
    * the same three published shapes in their one-sided convention
    * (Lan-DeMets OBF-like f(t) = 2 − 2Φ(Φ⁻¹(1−a/2)/√t); Pocock-like
    * a·ln(1+(e−1)t); Hwang-Shih-DeCani a·(1−e^{−γt})/(1−e^{−γ})).
    * Used for both the alpha (efficacy) and beta (futility) sides.
    */
  private def spendOneSided(t: Double, a: Double, spending: String,
      hsdGamma: Double = -4.0): Double = spending match {
    case "obf" =>
      2.0 - 2.0 * Phi(PhiInv(1.0 - a / 2.0) / math.sqrt(t))
    case "pocock" =>
      a * math.log(1.0 + (math.E - 1.0) * t)
    case "hsd" =>
      a * (1.0 - math.exp(-hsdGamma * t)) / (1.0 - math.exp(-hsdGamma))
    case other =>
      throw new IllegalArgumentException(
        s"AlphaSpending: spending must be 'obf', 'pocock' or 'hsd', got '$other'")
  }

  /** ONE-SIDED Lan-DeMets efficacy boundaries u_1..u_K (z-scale) at
    * overall one-sided level `alpha` — the NON-BINDING convention:
    * computed ignoring any futility boundary, so type I error holds
    * even when a futility stop is overridden. Same Armitage recursion
    * as [[ldBoundaries]], continuation region truncated below at
    * −8√t_k (the sub-density mass beyond is < 1e-15 — a fixed,
    * deterministic truncation, not a tolerance).
    */
  def oneSidedBoundaries(looks: Int, alpha: Double, spending: String,
      gridN: Int = 601): Array[Double] =
      memoized(("os", Seq(looks, alpha, spending, gridN))) {
    require(looks >= 2, s"oneSidedBoundaries: need looks>=2, got $looks")
    require(alpha > 0 && alpha < 0.5,
      s"oneSidedBoundaries: need alpha in (0,0.5), got $alpha")
    require(gridN >= 51 && gridN % 2 == 1,
      s"oneSidedBoundaries: need odd gridN>=51, got $gridN")
    val dt = 1.0 / looks
    val sig = math.sqrt(dt)
    val us = new Array[Double](looks)
    val a1 = sig * PhiInv(1.0 - spendOneSided(dt, alpha, spending))
    us(0) = a1 / sig
    var a = a1
    var lo = -8.0 * sig
    var xs = Array.tabulate(gridN)(i => lo + (a - lo) * i / (gridN - 1))
    var f = xs.map(x => phi(x / sig) / sig)
    var h = xs(1) - xs(0)
    var k = 2
    while (k <= looks) {
      val t = k * dt
      val targetInc = spendOneSided(t, alpha, spending) -
        spendOneSided((k - 1) * dt, alpha, spending)
      def crossProb(b: Double): Double = {
        var tot = 0.0; var i = 0
        while (i < gridN) {
          val w = if (i == 0 || i == gridN - 1) 0.5 else 1.0
          tot += w * f(i) * (1.0 - Phi((b - xs(i)) / sig))
          i += 1
        }
        tot * h
      }
      var blo = 0.0; var bhi = 10.0; var it = 0
      while (it < 100) {
        val mid = (blo + bhi) / 2.0
        if (crossProb(mid) > targetInc) blo = mid else bhi = mid
        it += 1
      }
      a = (blo + bhi) / 2.0
      us(k - 1) = a / math.sqrt(t)
      if (k < looks) {
        val nlo = -8.0 * math.sqrt(t)
        val nxs = Array.tabulate(gridN)(i => nlo + (a - nlo) * i / (gridN - 1))
        val nf = nxs.map { s =>
          var tot = 0.0; var i = 0
          while (i < gridN) {
            val w = if (i == 0 || i == gridN - 1) 0.5 else 1.0
            tot += w * f(i) * phi((s - xs(i)) / sig) / sig
            i += 1
          }
          tot * h
        }
        xs = nxs; f = nf; h = xs(1) - xs(0)
      }
      k += 1
    }
    us
  }

  /** One-sided group-sequential design with NON-BINDING beta-spending
    * FUTILITY bounds (Pampallona & Tsiatis '94 shape in the spending-
    * function formulation that gsDesign's test.type=4 made the
    * production standard): efficacy bounds u_k spend α*(t) under H0
    * ignoring futility ([[oneSidedBoundaries]]); futility bounds l_k
    * spend β*(t) under the H1 drift — P_{H1}(S_k < b_k, l_j ≤ S_j <
    * a_j ∀ j<k) = Δβ_k, via the same Armitage recursion carried on the
    * two-sided continuation region [b_{k-1}, a_{k-1}] with N(δΔt, Δt)
    * increments. The drift δ (the S-scale mean at t=1, = z_stat the
    * design is powered for) is solved by fixed-count bisection so the
    * two boundaries MEET at the final look (l_K = u_K — the defining
    * closure of the design: at full information every outcome is a
    * decision), which makes the achieved power exactly 1−β at δ.
    *
    * Deterministic: fixed grids, fixed 100-step inner and 60-step
    * outer bisections — the emitted doubles are frozen literals for
    * the declared query and its oracle (the ldBoundaries discipline).
    *
    * Returns (upper z-bounds, lower z-bounds, delta); lower(K-1) is
    * set to upper(K-1) exactly.
    *
    * Scale shape (100 TB): touches no data — O(60·K·gridN²) driver
    * doubles; the monitor rides the groupSequentialObf aggregate.
    */
  def futilityBoundaries(looks: Int, alpha: Double, beta: Double,
      spendingU: String, spendingL: String,
      gridN: Int = 601): (Array[Double], Array[Double], Double) =
      memoized(("fut", Seq(looks, alpha, beta, spendingU, spendingL, gridN))) {
    require(looks >= 2, s"futilityBoundaries: need looks>=2, got $looks")
    require(alpha > 0 && alpha < 0.5 && beta > 0 && beta < 0.5,
      s"futilityBoundaries: need alpha,beta in (0,0.5), got $alpha/$beta")
    require(gridN >= 51 && gridN % 2 == 1,
      s"futilityBoundaries: need odd gridN>=51, got $gridN")
    val us = oneSidedBoundaries(looks, alpha, spendingU, gridN)
    val dt = 1.0 / looks
    val sig = math.sqrt(dt)
    val aS = Array.tabulate(looks)(k => us(k) * math.sqrt((k + 1) * dt))

    // futility S-scale bounds b_1..b_K under drift `delta`; returns the
    // array (b_K left UNCLAMPED — the outer solve matches it to a_K)
    def futilityPass(delta: Double): Array[Double] = {
      val mu = delta * dt
      val bs = new Array[Double](looks)
      val b1 = delta * dt + sig * PhiInv(spendOneSided(dt, beta, spendingL))
      bs(0) = b1
      var xs = Array.tabulate(gridN)(i => b1 + (aS(0) - b1) * i / (gridN - 1))
      var f = xs.map(x => phi((x - delta * dt) / sig) / sig)
      var h = xs(1) - xs(0)
      var k = 2
      while (k <= looks) {
        val targetInc = spendOneSided(k * dt, beta, spendingL) -
          spendOneSided((k - 1) * dt, beta, spendingL)
        def futProb(b: Double): Double = {
          var tot = 0.0; var i = 0
          while (i < gridN) {
            val w = if (i == 0 || i == gridN - 1) 0.5 else 1.0
            tot += w * f(i) * Phi((b - xs(i) - mu) / sig)
            i += 1
          }
          tot * h
        }
        var blo = -10.0; var bhi = aS(k - 1) + 2.0; var it = 0
        while (it < 100) {
          val mid = (blo + bhi) / 2.0
          if (futProb(mid) < targetInc) blo = mid else bhi = mid
          it += 1
        }
        val b = (blo + bhi) / 2.0
        bs(k - 1) = b
        if (k < looks) {
          // extreme outer-bisection drifts can push b above a_k; a
          // collapsed [a_k, a_k] region keeps the recursion finite and
          // the outer solve's monotone signal intact (b_K lands high ⇒
          // "drift too large" ⇒ bisect down)
          val bG = math.min(b, aS(k - 1))
          val nxs = Array.tabulate(gridN)(i => bG + (aS(k - 1) - bG) * i / (gridN - 1))
          val nf = nxs.map { s =>
            var tot = 0.0; var i = 0
            while (i < gridN) {
              val w = if (i == 0 || i == gridN - 1) 0.5 else 1.0
              tot += w * f(i) * phi((s - xs(i) - mu) / sig) / sig
              i += 1
            }
            tot * h
          }
          xs = nxs; f = nf; h = xs(1) - xs(0)
        }
        k += 1
      }
      bs
    }

    // outer solve: delta such that the final futility bound meets the
    // final efficacy bound (b_K(delta) is increasing in delta)
    var dlo = 0.0; var dhi = 8.0; var it = 0
    while (it < 60) {
      val mid = (dlo + dhi) / 2.0
      if (futilityPass(mid)(looks - 1) < aS(looks - 1)) dlo = mid else dhi = mid
      it += 1
    }
    val delta = (dlo + dhi) / 2.0
    val bs = futilityPass(delta)
    val ls = Array.tabulate(looks)(k =>
      if (k == looks - 1) us(k) else bs(k) / math.sqrt((k + 1) * dt))
    (us, ls, delta)
  }
}
