package graft

/** ONE selection rule for every builder-side query filter
  * (Verify SPARK_GRAFT_ONLY, ScalingBench SPARK_GRAFT_SCALING_ONLY, the
  * ScalingBench q81/q114 section gates): a token selects a query iff it
  * is the exact name, OR a prefix of the name whose next character is
  * NOT a digit. The non-digit guard keeps the convenient family prefix
  * ("q90" → q90_asof, q90b, q90c) without the prefix trap ("q11"
  * silently also selecting q110..q119). Previously Verify used bare
  * startsWith and ScalingBench used exact-set membership — two tools,
  * two semantics. */
object QuerySelect {
  def matches(tokens: Set[String], name: String): Boolean =
    tokens.exists { t =>
      name == t ||
        (name.startsWith(t) && !name.charAt(t.length).isDigit)
    }

  /** Parse the comma-separated env filter; None = select everything. */
  def parse(env: Option[String]): Option[Set[String]] =
    env.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
}
