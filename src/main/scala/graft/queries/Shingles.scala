package graft.queries

/** The 4-token shingle definition shared by decontamination, near-dup
  * clustering and the e2e pipeline — ONE definition so the oracled
  * queries can never drift from each other on gram size or boundary
  * handling. Operates on a `toks` ARRAY<STRING> column. */
object Shingles {
  def fourGramSql(distinct: Boolean): String = {
    val core = "transform(sequence(1, size(toks) - 3)," +
      " k -> array_join(slice(toks, k, 4), ' '))"
    val body = if (distinct) s"array_distinct($core)" else core
    s"CASE WHEN size(toks) >= 4 THEN $body ELSE CAST(array() AS ARRAY<STRING>) END"
  }
}
