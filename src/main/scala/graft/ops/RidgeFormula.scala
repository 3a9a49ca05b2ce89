package graft.ops

/** Dual-interpretation scalar formulas for B72's ridge solve: ONE
  * expression tree both evaluates IEEE-double arithmetic on the Spark
  * driver AND prints the textually identical DuckDB SQL — the
  * mechanism that moves an in-engine d=4 normal-equation solve from
  * rows-only into the full hash-oracle gate. IEEE 754 binary ops and
  * sqrt are deterministic and correctly rounded given the same
  * expression tree and inputs, so when the oracle runs the printed
  * text on the same correctly-rounded moment doubles (HUGEINT::DOUBLE
  * ≙ DECIMAL(38,0).doubleValue), every intermediate — and therefore
  * the 6dp-floored output — is bit-identical. Neither engine
  * contracts a*b+c into FMA: DuckDB evaluates operator nodes
  * separately and the JVM fuses only via explicit Math.fma.
  *
  * The solve is Cramer's rule on the λ-regularized normal equations,
  * after an EXACT diagonal equilibration: features x1 = e (≤ ~1.1e5
  * dollars), x2 = e·dc, x3 = e·tc (≤ ~1.1e6) are rescaled by the
  * power-of-two constants 2⁻¹⁷ / 2⁻²⁰ / 2⁻²⁰ (exact in IEEE — no
  * rounding introduced), which balances XᵀX entries to O(n) and keeps
  * the 4×4 determinant cancellation benign; β recovers as d_i·γ_i.
  * RMSE comes from the same moment vector algebraically
  * (RSS = syy − 2βᵀXᵀy + βᵀXᵀXβ) — no second data pass.
  */
private[graft] object RidgeFormula {

  sealed trait E {
    def +(o: E): E = Bin(this, "+", o)
    def -(o: E): E = Bin(this, "-", o)
    def *(o: E): E = Bin(this, "*", o)
    def /(o: E): E = Bin(this, "/", o)
  }
  final case class V(name: String) extends E
  final case class C(v: Double, s: String) extends E
  final case class Bin(a: E, op: String, b: E) extends E
  final case class Sqrt(a: E) extends E

  def eval(e: E, env: collection.Map[String, Double]): Double = e match {
    case V(n)           => env(n)
    case C(v, _)        => v
    case Bin(a, "+", b) => eval(a, env) + eval(b, env)
    case Bin(a, "-", b) => eval(a, env) - eval(b, env)
    case Bin(a, "*", b) => eval(a, env) * eval(b, env)
    case Bin(a, op, b)  => require(op == "/"); eval(a, env) / eval(b, env)
    case Sqrt(a)        => math.sqrt(eval(a, env))
  }

  def sql(e: E): String = e match {
    case V(n)         => n
    case C(_, s)      => s
    case Bin(a, o, b) => s"(${sql(a)} $o ${sql(b)})"
    case Sqrt(a)      => s"sqrt(${sql(a)})"
  }

  private val one = C(1.0, "1.0")
  private val two = C(2.0, "2.0")
  // exact powers of two; the decimal literals are finite and parse to
  // the exact binary value in both engines
  private val d0 = C(7.62939453125e-06, "0.00000762939453125") // 2^-17
  private val d1 =
    C(9.5367431640625e-07, "0.00000095367431640625")           // 2^-20
  private val d2 = d1
  private val d3 = one
  private val scales = Vector(d0, d1, d2, d3)

  /** fixed 3×3 cofactor expansion — association is part of the
    * contract (both engines parse the printed text to this exact
    * tree)
    */
  private def det3(m: IndexedSeq[IndexedSeq[E]]): E =
    m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
      m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
      m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))

  private def det4(m: IndexedSeq[IndexedSeq[E]]): E = {
    def minor(j: Int): IndexedSeq[IndexedSeq[E]] =
      (1 to 3).map(r => (0 to 3).filterNot(_ == j).map(c => m(r)(c)))
    m(0)(0) * det3(minor(0)) - m(0)(1) * det3(minor(1)) +
      m(0)(2) * det3(minor(2)) - m(0)(3) * det3(minor(3))
  }

  /** Moment variable names, in the order the Spark agg produces them.
    * All are exact integer sums converted to double once; n is the
    * row count.
    */
  val momentNames: Seq[String] = Seq("n", "s1", "s2", "s3", "sy",
    "s11", "s12", "s13", "s22", "s23", "s33", "s1y", "s2y", "s3y",
    "syy")

  /** Named computation stages over the moment vars: each stage may
    * reference earlier stage names. The Spark driver folds them into
    * an env map; the oracle chains them as one CTE per dependency
    * rank — identical dataflow, identical doubles.
    */
  val stages: Seq[Seq[(String, E)]] = {
    // raw normal matrix (XᵀX + λI | λ=1) and rhs Xᵀy, then the exact
    // power-of-two equilibration A'_ij = d_i d_j A_ij, b'_i = d_i b_i
    val raw: Vector[Vector[E]] = Vector(
      Vector(V("s11") + one, V("s12"), V("s13"), V("s1")),
      Vector(V("s12"), V("s22") + one, V("s23"), V("s2")),
      Vector(V("s13"), V("s23"), V("s33") + one, V("s3")),
      Vector(V("s1"), V("s2"), V("s3"), V("n") + one))
    val a: IndexedSeq[IndexedSeq[E]] = Vector.tabulate(4, 4) { (i, j) =>
      raw(i)(j) * scales(i) * scales(j)
    }
    val b: IndexedSeq[E] =
      Vector(V("s1y") * d0, V("s2y") * d1, V("s3y") * d2, V("sy") * d3)
    def repl(col: Int): IndexedSeq[IndexedSeq[E]] =
      Vector.tabulate(4, 4)((i, j) => if (j == col) b(i) else a(i)(j))
    val dets = Seq("det" -> det4(a)) ++
      (0 to 3).map(i => s"det$i" -> det4(repl(i)))
    val betas = (0 to 3).map { i =>
      s"beta$i" -> V(s"det$i") / V("det") * scales(i)
    }
    val bty = V("beta0") * V("s1y") + V("beta1") * V("s2y") +
      V("beta2") * V("s3y") + V("beta3") * V("sy")
    val qform = V("beta0") * V("beta0") * V("s11") +
      V("beta1") * V("beta1") * V("s22") +
      V("beta2") * V("beta2") * V("s33") +
      V("beta3") * V("beta3") * V("n") +
      two * (V("beta0") * V("beta1") * V("s12") +
        V("beta0") * V("beta2") * V("s13") +
        V("beta0") * V("beta3") * V("s1") +
        V("beta1") * V("beta2") * V("s23") +
        V("beta1") * V("beta3") * V("s2") +
        V("beta2") * V("beta3") * V("s3"))
    val rss = Seq("rss" -> (V("syy") - two * bty + qform))
    val rmse = Seq("rmse" -> Sqrt(V("rss") / V("n")))
    Seq(dets, betas, rss, rmse)
  }

  /** Driver-side solve: moments (already exact integers, converted to
    * correctly-rounded doubles by the caller) → (beta0..3, rmse).
    */
  def solve(moments: Map[String, Double]): Map[String, Double] = {
    val env = collection.mutable.Map[String, Double]() ++ moments
    stages.foreach(_.foreach { case (nm, ex) => env(nm) = eval(ex, env) })
    env.toMap
  }

  /** The oracle's solve tail: CTE chain from a `m` CTE holding the
    * HUGEINT moments (column names = [[momentNames]]). Ends with a
    * CTE `rf` exposing n, beta0..beta3, rmse as doubles.
    */
  def oracleTail: String = {
    val md = "md AS (SELECT " + momentNames.map {
      case "n" => "n::DOUBLE AS n"
      case nm  => s"$nm::DOUBLE AS $nm"
    }.mkString(",\n    ") + "\n  FROM m)"
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      val src = if (i == 0) "md" else s"t${i - 1}"
      s"t$i AS (SELECT *,\n    " + st.map { case (nm, ex) =>
        s"${sql(ex)} AS $nm"
      }.mkString(",\n    ") + s"\n  FROM $src)"
    }
    (Seq(md) ++ ctes).mkString(",\n") +
      s",\nrf AS (SELECT * FROM t${stages.size - 1}),\n"
  }
}
