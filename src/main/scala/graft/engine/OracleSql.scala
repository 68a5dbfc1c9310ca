package graft.engine

/** Shared DuckDB-oracle SQL fragments (one definition — the cluster
  * oracles must never silently drift apart). */
private[engine] object OracleSql {

  /** Recursive connected-components suffix over caller-defined CTEs
    * `pairs(id_a, id_b)` and `nodes(id)`: undirected edge closure via
    * a reachability CTE, component = min reachable id, canonical =
    * the component's minimum. The enclosing WITH must be RECURSIVE. */
  def ccSuffix(idAlias: String): String = s""",
e AS (SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT id, id AS r FROM nodes
  UNION
  SELECT reach.id, e.b AS r FROM reach JOIN e ON e.a = reach.r
),
comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY 1)
SELECT n.id AS $idAlias, c.comp, (n.id = c.comp) AS is_canonical
FROM nodes n JOIN comp c ON c.id = n.id"""
}
