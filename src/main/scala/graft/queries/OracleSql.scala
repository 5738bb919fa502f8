package graft.queries

/** Shared DuckDB oracle-SQL fragments. The prefix-filter candidate CTEs
  * back every near-dup oracle (llm06/llm08/llm24/llm44); one definition
  * keeps a future threshold/shingle-width tweak from silently
  * de-synchronizing copies of the formula (a banding mismatch between
  * two hand-maintained copies already cost a missed pair once — see
  * llm08's comment).
  */
private[queries] object OracleSql {

  /** WITH-clause CTEs `edges0 .. lab` ON TOP of [[prefixFilterCtes]]:
    * exact-Jaccard edges at `threshold`, their symmetric closure, the
    * RECURSIVE reachability fixpoint, and the per-doc `canon_id` label
    * (min reachable id, self for singletons) — the transitive-closure
    * block llm66/llm68/llm73 all replay. One copy: an edge-predicate
    * or canon-rule change must not hand-sync across oracles. The
    * enclosing WITH must be declared RECURSIVE. `docWhere` restricts
    * the doc set (llm75 replays the post-delete corpus); empty = all.
    * `sfx` suffixes every CTE name so two closures can coexist in one
    * WITH clause (llm77 diffs two index states); "" leaves the names
    * bare, byte-identical to the pre-suffix form. */
  def closureCtes(threshold: Double, docWhere: String = "",
      sfx: String = ""): String =
    s"""${prefixFilterCtes(threshold, docWhere, sfx)},
       |edges0$sfx AS (SELECT x, y FROM cand$sfx
       |  JOIN sh0$sfx sa ON cand$sfx.x = sa.doc_id JOIN sh0$sfx sb ON cand$sfx.y = sb.doc_id
       |  WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |      / CAST(len(list_distinct(sa.s || sb.s)) AS DOUBLE) >= $threshold),
       |edges$sfx AS (SELECT x AS src, y AS dst FROM edges0$sfx
       |  UNION SELECT y, x FROM edges0$sfx),
       |reach$sfx AS (SELECT src AS a, src AS b FROM edges$sfx
       |  UNION
       |  SELECT r.a, e.dst FROM reach$sfx r JOIN edges$sfx e ON r.b = e.src),
       |lab$sfx AS (SELECT d.doc_id, COALESCE(c.canon, d.doc_id) AS canon_id
       |  FROM documents d LEFT JOIN
       |    (SELECT a AS doc_id, min(b) AS canon FROM reach$sfx GROUP BY a) c
       |    USING (doc_id)${whereClause(docWhere, "d")})""".stripMargin

  private def whereClause(docWhere: String, alias: String): String =
    if (docWhere.isEmpty) ""
    else " WHERE " + docWhere.replace("doc_id", s"$alias.doc_id")

  /** WITH-clause CTEs `sh0 .. cand`: per-doc 3-token-shingle sets and
    * the zero-false-negative prefix-filter candidate pairs at
    * `threshold` (PPJoin canonical order: df asc, shingle asc). */
  def prefixFilterCtes(threshold: Double, docWhere: String = "",
      sfx: String = ""): String =
    s"""sh0$sfx AS (SELECT doc_id,
       |    list_distinct(CASE WHEN len(string_split(text, ' ')) < 3
       |      THEN [array_to_string(string_split(text, ' '), ' ')]
       |      ELSE list_transform(range(0, len(string_split(text, ' ')) - 2),
       |             i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + 3), ' '))
       |      END) AS s
       |  FROM documents${whereClause(docWhere, "documents")}),
       |inv$sfx AS (SELECT doc_id, unnest(s) AS shingle FROM sh0$sfx),
       |dft$sfx AS (SELECT shingle, count(*) AS df FROM inv$sfx GROUP BY 1),
       |canon$sfx AS (SELECT i.doc_id, list(i.shingle ORDER BY d.df, i.shingle) AS s
       |  FROM inv$sfx i JOIN dft$sfx d USING (shingle) GROUP BY i.doc_id),
       |pre$sfx AS (SELECT doc_id, unnest(list_slice(s, 1,
       |    CAST(len(s) AS BIGINT)
       |      - CAST(ceil(CAST($threshold AS DOUBLE) * CAST(len(s) AS DOUBLE)) AS BIGINT) + 1)) AS shingle
       |  FROM canon$sfx),
       |cand$sfx AS (SELECT DISTINCT a.doc_id AS x, b.doc_id AS y
       |  FROM pre$sfx a JOIN pre$sfx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id)""".stripMargin

  /** Exact-Jaccard verification select over [[prefixFilterCtes]]'s
    * `cand`/`sh0`, emitting (id_a, id_b, jaccard[, extraSelect]). */
  def verifiedPairsSelect(threshold: Double, extraSelect: String = "",
      extraWhere: String = ""): String =
    s"""SELECT x AS id_a, y AS id_b, j AS jaccard$extraSelect FROM (
       |  SELECT x, y, CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |      / CAST(len(list_distinct(sa.s || sb.s)) AS DOUBLE) AS j
       |  FROM cand JOIN sh0 sa ON cand.x = sa.doc_id JOIN sh0 sb ON cand.y = sb.doc_id)
       |WHERE j >= $threshold$extraWhere""".stripMargin
}
