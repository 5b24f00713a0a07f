package graft.operators

/** Engine-portable exact linear-algebra kernel for the Markov
  * removal-effect attribution (Events.markovRemovalAttribution): a
  * Leibniz-formula determinant whose TERM ORDER is fixed (lexicographic
  * permutations) and whose float evaluation order is a left fold — so
  * the same enumeration drives BOTH the Scala solve and the generated
  * DuckDB SQL mirror, and Cramer's rule replays bit-for-bit across
  * engines. Gaussian elimination (the textbook solve) is NOT portable:
  * partial pivoting picks row order from data values, so its float
  * path differs run-to-run and engine-to-engine; Leibniz at m <= 6 is
  * a few hundred fused terms — trivial for the metadata-sized systems
  * an absorbing-chain attribution produces (m = |channels|).
  */
private[graft] object MarkovSolve {

  /** Permutations of 0 until m in LEXICOGRAPHIC order with their signs
    * (+1.0 / -1.0 by inversion parity). This sequence is the shared
    * source of truth for [[det]] and [[detSql]] — identical term order
    * by construction.
    */
  def lexPerms(m: Int): Seq[(Double, IndexedSeq[Int])] = {
    require(m >= 0 && m <= 6, s"lexPerms: need 0<=m<=6 (m! terms), got $m")
    (0 until m).permutations.map { p =>
      val inv = (for {
        i <- 0 until m; j <- i + 1 until m if p(i) > p(j)
      } yield 1).size
      ((if (inv % 2 == 0) 1.0 else -1.0), p)
    }.toSeq
  }

  /** Leibniz determinant: sum over [[lexPerms]] of sign * product,
    * the product a left fold from 1.0 (1.0*x == x exactly), the sum a
    * left fold from 0.0. Mirrored term-for-term by [[detSql]].
    */
  def det(m: Int, a: (Int, Int) => Double): Double =
    lexPerms(m).foldLeft(0.0) { case (acc, (sgn, p)) =>
      acc + sgn * (0 until m).foldLeft(1.0)((pr, i) => pr * a(i, p(i)))
    }

  /** The same determinant as a SQL expression: `(0e0 + (f*f*f) -
    * (f*f*f) ...)` — SQL's left-associative `*`/`+`/`-` reproduce the
    * Scala folds exactly (x - y == x + (-y) and -1.0*p == -p in IEEE).
    */
  def detSql(m: Int, a: (Int, Int) => String): String =
    "(0e0 " + lexPerms(m).map { case (sgn, p) =>
      val prod = (0 until m).map(i => a(i, p(i))).mkString(" * ")
      (if (sgn > 0) "+ " else "- ") + s"($prod)"
    }.mkString(" ") + ")"
}
