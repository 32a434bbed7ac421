package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational edge lists.
  *
  * The near-dup family already runs one graph algorithm (label
  * propagation in [[TextDedup.dedupClusters]]); PageRank is the other
  * canonical iterative workload — importance scoring over a link graph
  * (document link graphs for crawl prioritization, entity graphs for
  * canonical-record election).
  *
  * Determinism: all rank arithmetic is INTEGER, on ranks scaled to
  * `scale` units of total mass — integer division is bit-reproducible
  * across engines, partitionings, and summation orders, so a fixed
  * iteration count yields a hash-exact result (the float formulation
  * would accumulate order-dependent ulps in every per-node sum). The
  * deliberate rounding-down of `div` loses a few units of mass per node
  * per iteration (bounded by (outdeg+2)/scale relative error — ppb at
  * the default scale), which a float implementation would also lose,
  * just nondeterministically.
  *
  * Scale: per iteration, one equi-join of edges to the current ranks on
  * src (both sides hash-partitioned on the join key — co-partitioned
  * across iterations since edges are persisted post-shuffle) and one
  * aggregation by dst. Edge and rank tables are the ONLY shuffled data;
  * ranks are 2 columns regardless of graph payload width. Lineage is cut
  * with `localCheckpoint` every 4 iterations (same discipline as
  * dedupClusters) so a 50-iteration production run does not grow an
  * unbounded plan.
  */
object Graph {

  /** Rebind `df` into a CHILD session whose shuffle partitioning is
    * sized to the GRAPH (~1 partition per 500k rows, min 2), not the
    * session default: every iterative graph op here runs 4–10 rounds of
    * joins over tables that are tiny next to the corpus, and paying a
    * full session-width shuffle fan-out per round is pure task-schedule
    * overhead (the [[graft.ops.TextDedup.dedupClusters]] discipline —
    * isolated SQLConf, shared context and cache, caller's conf
    * untouched). Results are integer-exact and therefore identical at
    * any partitioning.
    */
  private def graphSession(parent: SparkSession, nRows: Long,
                           rowsPerPartition: Long = 500000L): SparkSession = {
    val sessionParts = scala.util.Try(
      parent.conf.get("spark.sql.shuffle.partitions").toLong).getOrElse(200L)
    val parts = math.max(2L,
      math.min(sessionParts, nRows / rowsPerPartition + 1L))
    val child = parent.newSession()
    child.conf.set("spark.sql.shuffle.partitions", parts.toString)
    child
  }

  /** Re-root a DataFrame's plan in `s` so it plans under that session's
    * conf (same SparkContext; the RDD lineage carries over). */
  private def rebind(s: SparkSession, df: DataFrame): DataFrame =
    s.createDataFrame(df.rdd, df.schema)

  /** PageRank with damping 0.85 over the undirected graph given by
    * `edges(src, dst)` (both directions are added here). Returns
    * (node, rank) with rank in integer `scale` units; Σrank ≈ scale.
    */
  def pageRank(spark: SparkSession, edges: DataFrame, iterations: Int = 10,
               scale: Long = 1000000000000L): DataFrame = {
    // both directions from ONE pass over the (often join-shaped) edges
    // plan: the two-select union evaluated the unpersisted input twice
    // during ed0's materialization (optimization round 15; same rows)
    val ed0 = edges.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist()
    // pagerank touches every edge every round (unlike the frontier
    // ops), so give it more slots: ~10k edges per partition
    val child = graphSession(edges.sparkSession, ed0.count(), 10000L)
    val ed = rebind(child, ed0).persist()
    val deg = ed.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
      .persist()
    val n = deg.count() // scalar graph metadata, not data rows
    require(n > 0, "pageRank: empty graph")
    val init = scale / n
    val base = (15L * init) / 100L

    var ranks = deg.select(col("node"), col("outdeg"),
      lit(init).as("rank")).persist()
    ranks.count()

    for (i <- 1 to iterations) {
      val contrib = ed.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
      val sums = contrib.groupBy("node").agg(sum(col("c")).as("s"))
      var next = deg.join(sums, Seq("node"), "left")
        .select(col("node"), col("outdeg"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
        .persist()
      if (i % 4 == 0) next = next.localCheckpoint(true)
      else next.count()
      ranks.unpersist()
      ranks = next
    }
    val out = ranks.select(col("node"), col("rank"))
    ed.unpersist(); deg.unpersist(); ed0.unpersist()
    out
  }

  /** The DuckDB oracle for [[pageRank]]: the same integer recurrence
    * unrolled into `iterations` chained CTEs over an `edges(src, dst)`
    * CTE body. Generated here so the Spark operator and its oracle share
    * one definition of the arithmetic (order of operations included).
    */
  def pageRankOracleSql(edgesCte: String, iterations: Int = 10,
                        scale: Long = 1000000000000L): String = {
    val iters = (1 to iterations).map { i =>
      s"""r$i AS (SELECT d.node, d.outdeg,
         |   (SELECT (15 * ($scale // cnt)) // 100 FROM nn)
         |     + (85 * COALESCE(s.s, 0)) // 100 AS rank
         | FROM deg d LEFT JOIN (
         |   SELECT ed.dst AS node, SUM(r.rank // r.outdeg) AS s
         |   FROM ed JOIN r${i - 1} r ON ed.src = r.node GROUP BY 1) s
         |   ON d.node = s.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS ($edgesCte),
       | ed AS (SELECT DISTINCT src, dst FROM
       |   (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
       | deg AS (SELECT src AS node, count(*) AS outdeg FROM ed GROUP BY 1),
       | nn AS (SELECT count(*) AS cnt FROM deg),
       | r0 AS (SELECT node, outdeg,
       |   (SELECT $scale // cnt FROM nn) AS rank FROM deg),
       |$iters
       |-- BIGINT, not the HUGEINT the sum chain infers: the harness's
       |-- pandas bridge renders HUGEINT as float ("...0.0" strings)
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$iterations""".stripMargin
  }

  /** Multi-source BFS: minimum hop distance from any seed node, explored
    * to `maxHops` over the undirected graph of `edges(src, dst)` — the
    * reachability/blast-radius query (which records does this entity
    * touch within k relationships?). Returns (node, hop) for reached
    * nodes only.
    *
    * Scale: classic frontier expansion — per hop, one equi-join of the
    * CURRENT FRONTIER (not the visited set) against the persisted edge
    * list, then an anti-join against visited; both shuffles are
    * frontier-sized. Hop arithmetic is integer, so the result is
    * hash-exact. Lineage is cut with `localCheckpoint` every 4 hops
    * (the [[pageRank]]/dedupClusters discipline).
    */
  def bfsHops(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
              maxHops: Int = 4): DataFrame = {
    // both directions from ONE pass over the (often join-shaped) edges
    // plan: the two-select union evaluated the unpersisted input twice
    // during ed0's materialization (optimization round 15; same rows)
    val ed0 = edges.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist()
    val child = graphSession(edges.sparkSession, ed0.count())
    val ed = rebind(child, ed0).persist()
    var visited = rebind(child, seeds.select(col("node")).distinct())
      .withColumn("hop", lit(0)).persist()
    visited.count()
    var frontier = visited
    for (h <- 1 to maxHops) {
      var next = ed.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hop", lit(h))
        .persist()
      if (h % 4 == 0) next = next.localCheckpoint(true) else next.count()
      val nv = visited.unionByName(next).persist()
      nv.count()
      visited.unpersist()
      visited = nv
      frontier = next
    }
    ed.unpersist(); ed0.unpersist()
    visited
  }

  /** Multi-source shortest paths over a WEIGHTED undirected graph:
    * `rounds` Bellman-Ford relaxations from the seed set — min total
    * edge weight within that hop budget (the weighted sibling of
    * [[bfsHops]]; think cheapest connection, not just reachability).
    * Weights are integers (cents/quantities — the engine's exact-money
    * rule), so every relaxation is a min over exact sums and the result
    * is hash-exact at any partitioning.
    *
    * Scale: per round, one equi-join of the CURRENT distance table
    * against the persisted edge list + a min-aggregation — both
    * distance-table-sized; parallel edges collapse to their min weight
    * up front. Same `localCheckpoint` lineage discipline as
    * [[pageRank]].
    */
  def shortestPaths(spark: SparkSession, edges: DataFrame,
                    seeds: DataFrame, rounds: Int = 4): DataFrame = {
    val ed0 = edges.select(col("src"), col("dst"), col("w"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .persist()
    val child = graphSession(edges.sparkSession, ed0.count())
    val ed = rebind(child, ed0).persist()
    var dist = rebind(child, seeds.select(col("node")).distinct())
      .withColumn("dist", lit(0L)).persist()
    dist.count()
    for (r <- 1 to rounds) {
      val relax = ed.join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      var next = dist.unionByName(relax)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .persist()
      if (r % 4 == 0) next = next.localCheckpoint(true) else next.count()
      dist.unpersist()
      dist = next
    }
    ed.unpersist(); ed0.unpersist()
    dist
  }

  /** The DuckDB oracle for [[shortestPaths]]: the same relaxation
    * unrolled into `rounds` chained CTEs. */
  def shortestPathsOracleSql(edgesCte: String, seedsSql: String,
                             rounds: Int = 4): String = {
    val iters = (1 to rounds).map { i =>
      s"""d$i AS (SELECT node, min(dist) AS dist FROM (
         |   SELECT node, dist FROM d${i - 1}
         |   UNION ALL
         |   SELECT ed.dst AS node, d.dist + ed.w AS dist
         |   FROM d${i - 1} d JOIN ed ON ed.src = d.node)
         | GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS ($edgesCte),
       | ed AS (SELECT src, dst, min(w) AS w FROM
       |   (SELECT src, dst, w FROM e0
       |    UNION ALL SELECT dst, src, w FROM e0) GROUP BY 1, 2),
       | seeds AS ($seedsSql),
       | d0 AS (SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist FROM seeds),
       |$iters
       |SELECT node, CAST(dist AS BIGINT) AS dist FROM d$rounds""".stripMargin
  }

  /** The DuckDB oracle for [[bfsHops]]: a recursive CTE over the same
    * edges CTE body and seed predicate — min(hop) per reached node.
    * Generated here so operator and oracle share one definition of the
    * graph construction.
    */
  def bfsOracleSql(edgesCte: String, seedsSql: String,
                   maxHops: Int = 4): String =
    s"""WITH RECURSIVE e0 AS ($edgesCte),
       | ed AS (SELECT DISTINCT src, dst FROM
       |   (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
       | seeds AS ($seedsSql),
       | walk AS (
       |   SELECT node, 0 AS hop FROM seeds
       |   UNION
       |   SELECT ed.dst AS node, walk.hop + 1 AS hop
       |   FROM walk JOIN ed ON ed.src = walk.node
       |   WHERE walk.hop < $maxHops)
       |SELECT node, CAST(min(hop) AS INT) AS hop FROM walk GROUP BY node""".stripMargin

  /** Deterministic hash-driven random walks — the node2vec/DeepWalk
    * sampling primitive (Perozzi et al. 2014, arXiv:1403.6652; Grover &
    * Leskovec 2016, arXiv:1607.00653): one `steps`-step walk starts at
    * EVERY node of the undirected graph; at step t from node v the walk
    * moves to v's neighbor at index H(v)·31 + t mod deg(v), neighbors
    * ranked by node id, H the portable char-polynomial hash. The walk
    * corpus (walk, step, node) is what a graph-embedding trainer
    * consumes as sentences.
    *
    * Determinism contract (what makes the SQL oracle replay this
    * bit-for-bit): the step choice hashes the CURRENT node and step
    * only, so walks co-located at the same node and step move together.
    * A production sampler wanting independent walks salts the hash with
    * the walk id — one extra concat, identical plan shape.
    *
    * Scale: the adjacency builds with one groupBy into posting lists
    * (max-degree bounded — hub-heavy graphs should cap degree the way
    * [[linkPredict]] does); each step is ONE equi-join of the 2-column
    * (walk, cur) frontier against the persisted adjacency, shuffles
    * sized by the child session; each step materializes via eager
    * `localCheckpoint` (the iterative-op lineage discipline), so the
    * final union reads `steps`+1 flat frames.
    */
  def graphWalks(spark: SparkSession, edges: DataFrame,
                 steps: Int = 4): DataFrame = {
    // both directions from ONE pass over the (often join-shaped) edges
    // plan: the two-select union evaluated the unpersisted input twice
    // during ed0's materialization (optimization round 15; same rows)
    val ed0 = edges.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist()
    val child = graphSession(edges.sparkSession, ed0.count())
    val adj = rebind(child, ed0)
      .groupBy(col("src"))
      .agg(array_sort(collect_list(col("dst"))).as("nbrs"))
      .persist()
    adj.count()
    def charHash(s: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      graft.ops.Text.polyFold(transform(split(s, ""),
        c => ascii(c).cast("long")))
    var frontier = adj.select(col("src").as("walk"), col("src").as("cur"))
      .localCheckpoint(true)
    val outs = scala.collection.mutable.Buffer[DataFrame](
      frontier.withColumn("step", lit(0)))
    for (t <- 1 to steps) {
      val idx = (pmod(charHash(frontier("cur")) * lit(31L) + lit(t.toLong),
        size(adj("nbrs")).cast("long")).cast("int") + lit(1))
      frontier = frontier.join(adj, frontier("cur") === adj("src"))
        .select(frontier("walk"),
          element_at(adj("nbrs"), idx).as("cur"))
        .localCheckpoint(true)
      outs += frontier.withColumn("step", lit(t))
    }
    adj.unpersist(); ed0.unpersist()
    outs.reduce(_ unionByName _)
      .select(col("walk"), col("step"), col("cur").as("node"))
  }

  /** The DuckDB oracle for [[graphWalks]]: the same adjacency ranking
    * and per-step hash arithmetic unrolled into `steps` chained CTEs.
    * Generated here so operator and oracle share one definition of the
    * hash and the neighbor-index rule.
    */
  def graphWalksOracleSql(edgesCte: String, steps: Int = 4): String = {
    def h(c: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |     list_transform(string_split($c, ''),
         |       c -> CAST(ascii(c) AS BIGINT))),
         |   (a, x) -> (a * 1000003 + x) % 1000000007)""".stripMargin
    val stepCtes = (1 to steps).map { t =>
      s""" s$t AS (SELECT w.walk,
         |   a.nbrs[CAST((${h("w.cur")} * 31 + $t) % len(a.nbrs)
         |     AS INT) + 1] AS cur
         | FROM s${t - 1} w JOIN adj a ON w.cur = a.src)""".stripMargin
    }.mkString(",\n")
    val unions = (0 to steps).map(t =>
      s"SELECT walk, CAST($t AS INT) AS step, cur AS node FROM s$t")
      .mkString("\n UNION ALL ")
    s"""WITH e0 AS ($edgesCte),
       | ed AS (SELECT DISTINCT src, dst FROM
       |   (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
       | adj AS (SELECT src, list(dst ORDER BY dst) AS nbrs
       |   FROM ed GROUP BY src),
       | s0 AS (SELECT src AS walk, src AS cur FROM adj),
       |$stepCtes
       |$unions""".stripMargin
  }

  /** Per-node triangle count + degree over the undirected simple graph
    * given by `edges(a, b)` (any orientation; duplicates and self-loops
    * are dropped here). Returns (node, deg, triangles) for every node
    * with at least one edge — the local-clustering / cohesion primitive
    * (community cores in an entity graph, co-purchase density, link-farm
    * detection in a crawl graph).
    *
    * Algorithm: degree-ordered orientation. Each canonical edge is
    * directed from its lower endpoint to its higher endpoint in the
    * total order (deg, node); the orientation is acyclic and every
    * triangle has exactly ONE vertex whose two triangle edges both point
    * outward, so counting (wedge at u) ⋈ (closing edge) counts each
    * triangle exactly once — no /3 correction, no double counting.
    *
    * Scale: the wedge generation is the only super-linear term —
    * Σᵤ C(outdeg(u), 2) rows — and ordering by degree is the standard
    * minimizer of that sum (max outdeg = O(√m) on any graph, so wedges
    * = O(m^1.5) worst case; far less on real degree-skewed graphs,
    * where the hubs become wedge SINKS, not sources). Every shuffle
    * carries only (id, id) pairs: degrees join back by node id, wedges
    * hash-join the canonical edge set on (x, y). All counts are
    * integers — bit-reproducible at any partitioning.
    */
  def triangleCount(spark: SparkSession, edges: DataFrame): DataFrame = {
    val e0 = edges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()
    // wedge join fans out ~outdeg per edge row: size partitions tighter
    // than the frontier ops (250k edge rows per slot)
    val child = graphSession(spark, e0.count(), 250000L)
    val ed = rebind(child, e0).persist()
    val deg = ed.select(col("a").as("node"))
      .union(ed.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .persist()
    val withDeg = ed
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"))
      .persist()
    oriented.count()
    val wedges = oriented.select(col("u"), col("v").as("x"))
      .join(oriented.select(col("u"), col("v").as("y")), Seq("u"))
      .filter(col("x") < col("y"))
    val tri = wedges.join(ed,
        wedges("x") === ed("a") && wedges("y") === ed("b"))
      .select(col("u"), col("x"), col("y"))
    val perNode = tri.select(col("u").as("node"))
      .union(tri.select(col("x").as("node")))
      .union(tri.select(col("y").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    val out = deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
    e0.unpersist(); // ed/deg/oriented stay hot until out is consumed
    out
  }

  /** The DuckDB oracle for [[triangleCount]]: canonical a<b edges, each
    * triangle enumerated once as e1=(x,y) ⋈ e2=(y,z) ⋈ e3=(x,z) with
    * x<y<z (no orientation needed — semantically identical to the
    * degree-ordered plan), corners unioned for per-node counts.
    * Generated here so operator and oracle share one edge
    * canonicalization.
    */
  def triangleOracleSql(edgesCte: String): String =
    s"""WITH e0 AS ($edgesCte),
       | ed AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
       |        FROM e0 WHERE a <> b),
       | deg AS (SELECT node, count(*) AS deg FROM
       |   (SELECT a AS node FROM ed UNION ALL SELECT b FROM ed)
       |   GROUP BY 1),
       | tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |         FROM ed e1
       |         JOIN ed e2 ON e2.a = e1.b
       |         JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
       | corners AS (SELECT x AS node FROM tri
       |   UNION ALL SELECT y FROM tri
       |   UNION ALL SELECT z FROM tri),
       | tc AS (SELECT node, count(*) AS triangles FROM corners GROUP BY 1)
       |SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
       |       CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles
       |FROM deg d LEFT JOIN tc t ON t.node = d.node""".stripMargin

  /** k-core decomposition for a FIXED k: iteratively peel nodes of
    * degree < k until the remaining subgraph is stable; the survivors
    * are the k-core — the standard "dense engagement backbone" cut for
    * community mining and spam-ring detection. Returns each surviving
    * node with its degree INSIDE the core.
    *
    * Each round is one degree aggregation + two semi-joins, all sized
    * to the CURRENT edge set (monotonically shrinking); convergence is
    * detected by edge count and non-convergence within `maxRounds`
    * fails loudly rather than returning a half-peeled graph. Peeling
    * is order-independent (removing any sub-k node never raises
    * another node's degree), so the fixpoint — and the output — is
    * deterministic regardless of partitioning or round batching.
    */
  def kCore(spark: SparkSession, edges: DataFrame, k: Int,
            maxRounds: Int = 12): DataFrame = {
    // both directions from ONE pass over the (often join-shaped) edges
    // plan: the two-select union evaluated the unpersisted input twice
    // during ed0's materialization (optimization round 15; same rows)
    val ed0 = edges.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist()
    val child = graphSession(edges.sparkSession, ed0.count())
    var ed = rebind(child, ed0).persist()
    var nEdges = ed.count()
    var stable = false
    var round = 0
    while (!stable && round < maxRounds) {
      round += 1
      val keep = ed.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("node"))
      var next = ed
        .join(keep.withColumnRenamed("node", "src"), Seq("src"), "semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "semi")
        .select(col("src"), col("dst"))
        .persist()
      if (round % 4 == 0) next = next.localCheckpoint(true)
      val nNext = next.count()
      ed.unpersist()
      ed = next
      stable = nNext == nEdges
      nEdges = nNext
    }
    require(stable, s"kCore: no fixpoint after $maxRounds rounds")
    val out = ed.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_deg"))
    ed0.unpersist()
    out
  }

  /** The DuckDB oracle for [[kCore]]: the peel unrolled `rounds` times
    * over the same undirected-distinct edge CTE. Once the fixpoint is
    * reached the filter is IDEMPOTENT, so unrolling more rounds than
    * the Spark side needed changes nothing — the two sides agree as
    * long as the Spark run converged (which it asserts).
    */
  def kCoreOracleSql(edgesCte: String, k: Int, rounds: Int = 12): String = {
    // each round references its predecessor three times — MATERIALIZED
    // stops DuckDB's CTE inlining from re-expanding the chain 3^rounds
    // times (which re-opens the parquet scan until fd exhaustion)
    val iters = (1 to rounds).map { i =>
      s"""keep$i AS MATERIALIZED (SELECT src FROM ed${i - 1}
         |   GROUP BY src HAVING count(*) >= $k),
         | ed$i AS MATERIALIZED (SELECT src, dst FROM ed${i - 1}
         | WHERE src IN (SELECT src FROM keep$i)
         |   AND dst IN (SELECT src FROM keep$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS ($edgesCte),
       | ed0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM
       |   (SELECT src, dst FROM e0
       |    UNION ALL SELECT dst AS src, src AS dst FROM e0)),
       |$iters
       |SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
       |FROM ed$rounds GROUP BY 1""".stripMargin
  }

  /** Link prediction by neighborhood Jaccard (Liben-Nowell & Kleinberg
    * 2003): for every NON-adjacent pair (u, v) with at least `minCommon`
    * common neighbors, emit cn = |Γ(u)∩Γ(v)|, both degrees, and
    * jaccard = cn / (deg_u + deg_v - cn) — the "customers also bought"
    * / record-linkage-candidate primitive over the same co-purchase
    * edge shape [[triangleCount]] consumes.
    *
    * Candidate pairs are exactly the wedges (2-paths), so like the
    * triangle op the wedge join is the one super-linear term
    * (Σ_w C(deg(w), 2)). Unlike [[triangleCount]], this op cannot
    * orient away from hubs (it needs wedges in both directions), so the
    * quadratic term is BOUNDED EXPLICITLY: each wedge center keeps at
    * most `maxCenterDegree` neighbors, selected in a deterministic
    * multiplicative-hash order (Knuth's 2654435761 scheme — an
    * engine-independent pseudo-random permutation of numeric node ids,
    * valid for ids < 2^31.5 so the 64-bit product cannot overflow).
    * Per-center wedge fan-out is therefore ≤ C(maxCenterDegree, 2)
    * regardless of skew — one degree-10⁵ hub emits ~2k pairs, not
    * 5×10⁹. ESTIMATOR CONTRACT: cn (and hence jaccard) is EXACT for a
    * pair whenever every shared neighbor has degree ≤ maxCenterDegree,
    * and a deterministic lower bound otherwise (shared hub neighbors
    * are subsampled, never double-counted); deg_u/deg_v are always
    * exact. The selection is a pure function of the node ids, so
    * results stay bit-reproducible at any partitioning and the oracle
    * replays it exactly. The `row_number <= k` filter compiles to
    * WindowGroupLimit, which pre-prunes each center's list map-side
    * before the wedge shuffle. `minCommon >= 2` then prunes the
    * quadratic tail of one-shared-neighbor pairs before the degree
    * joins. Numerators and denominators are integer counts; jaccard is
    * ONE rounded division — bit-reproducible. Shuffles carry (id, id)
    * pairs only.
    */
  def linkPredict(spark: SparkSession, edges: DataFrame,
                  minCommon: Long = 2L,
                  maxCenterDegree: Int = 1024): DataFrame = {
    val e0 = edges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()
    val dir0 = e0.select(col("a").as("u"), col("b").as("w"))
      .union(e0.select(col("b").as("u"), col("a").as("w")))
      .persist()
    val deg0 = dir0.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .persist()
    // Size the child session's shuffles to the CAPPED WEDGE fan-out —
    // the op's one super-linear term — computed exactly from the degree
    // histogram (Σ C(min(deg, cap), 2); a one-number aggregate). Sizing
    // to the edge list, as the frontier ops do, under-parallelizes this
    // op by the average degree: 400k edges → 2 partitions carrying 17M
    // wedge rows at sf0.1.
    val capDeg = least(col("deg"), lit(maxCenterDegree.toLong))
    val wedgeEst = deg0.select(
      coalesce(sum(capDeg * (capDeg - lit(1L))), lit(0L))).first.getLong(0) / 2
    val child = graphSession(spark, wedgeEst, 500000L)
    val ed = rebind(child, e0).persist()
    val dir = rebind(child, dir0).persist()
    val deg = rebind(child, deg0).persist()
    // Skew-split: only rows whose wedge center is an actual hub
    // (deg > cap) pay the row_number sort; sub-cap centers — the
    // overwhelming majority by definition of skew — bypass it
    // untouched (the window would keep all their rows anyway, so the
    // union is semantically identical to a uniform window; the oracle
    // uses the uniform formulation). |hubs| < 2m/cap because degrees
    // sum to 2m, so the hub list broadcast is bounded by edge count
    // over cap — ids only, ~2M rows at 10⁹ edges with the default cap.
    val hubs = deg.filter(col("deg") > maxCenterDegree)
      .select(col("u").as("w"))
    val hubRows = dir.select(col("w"), col("u"))
      .join(broadcast(hubs), Seq("w"), "semi")
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w"))
      .orderBy(pmod(col("u").cast("long") * lit(2654435761L),
        lit(4294967296L)), col("u"))
    val cappedHubRows = hubRows
      .withColumn("rnk", row_number().over(ord))
      .filter(col("rnk") <= maxCenterDegree)
      .drop("rnk")
    val capped = dir.select(col("w"), col("u"))
      .join(broadcast(hubs), Seq("w"), "anti")
      .unionByName(cappedHubRows)
      .persist()
    capped.count() // materialize once; the wedge join reads it twice
    val cn = capped
      .join(capped.select(col("w"), col("u").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCommon)
    val nonEdges = cn.join(ed,
        cn("u") === ed("a") && cn("v") === ed("b"), "left_anti")
    val out = nonEdges
      .join(deg.select(col("u"), col("deg").as("deg_u")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("deg_v")), Seq("v"))
      .select(col("u"), col("v"), col("cn"), col("deg_u"), col("deg_v"),
        round(col("cn").cast("double")
          / (col("deg_u") + col("deg_v") - col("cn")).cast("double"), 6)
          .as("jaccard"))
    e0.unpersist(); dir0.unpersist(); deg0.unpersist()
    out // ed/dir/deg/capped stay hot until out is consumed
  }

  /** Bill-of-materials rollup: the SUM-PRODUCT transitive closure of a
    * component DAG — for every assembly, the total units of every
    * (transitive) component needed per one unit of the assembly, and
    * the closure aggregated per ancestor. The multiplicative sibling of
    * [[bfsHops]] (min-hop) and [[shortestPaths]] (min-sum): path values
    * MULTIPLY along edges and ADD across paths, the requirement-
    * explosion query every manufacturing/packaging pipeline runs.
    *
    * Algorithm: frontier extension at the path head — each length-L
    * path decomposes uniquely as (top edge) + (length-L−1 suffix), so
    * extending only the previous frontier generates every path exactly
    * once, no dedup pass. `levels` bounds depth; all arithmetic is
    * integer (qty products then sums) — bit-reproducible, and the
    * closure is at most depth × |nodes| rows on a tree (path-count-
    * bounded on a DAG). Shuffles carry (id, id, long) triples only;
    * frontier joins are frontier-sized, the [[bfsHops]] discipline.
    */
  def bomRollup(spark: SparkSession, edges: DataFrame,
                levels: Int = 6): DataFrame = {
    val ed0 = edges.select(col("parent"), col("child"), col("qty"))
      .persist()
    val child = graphSession(edges.sparkSession, ed0.count())
    val ed = rebind(child, ed0).persist()
    val up = ed.select(col("parent").as("up"), col("child").as("anc"),
      col("qty").as("q"))
    var frontier = ed.select(col("parent").as("anc"),
      col("child").as("node"), col("qty").cast("long").as("units"))
      .persist()
    var closure = frontier
    for (i <- 2 to levels) {
      val next = frontier.join(up, Seq("anc"))
        .select(col("up").as("anc"), col("node"),
          (col("units") * col("q")).as("units"))
        .persist()
      next.count()
      frontier.unpersist()
      frontier = next
      closure = closure.unionByName(frontier)
    }
    val out = closure.groupBy(col("anc"))
      .agg(count(lit(1)).as("n_desc"), sum(col("units")).as("total_units"))
    ed0.unpersist()
    out
  }

  /** The DuckDB oracle for [[bomRollup]]: the frontier extension
    * unrolled into `levels` chained CTEs over the same edge CTE body,
    * unioned and aggregated identically. */
  def bomRollupOracleSql(edgesCte: String, levels: Int = 6): String = {
    val fronts = (2 to levels).map { i =>
      s"""f$i AS (SELECT e.parent AS anc, f.node, f.units * e.qty AS units
         |        FROM f${i - 1} f JOIN ed e ON f.anc = e.child)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to levels).map(i => s"SELECT * FROM f$i")
      .mkString("\n UNION ALL ")
    s"""WITH ed AS ($edgesCte),
       | f1 AS (SELECT parent AS anc, child AS node,
       |        CAST(qty AS BIGINT) AS units FROM ed),
       |$fronts,
       | c AS ($unions)
       |SELECT anc, CAST(count(*) AS BIGINT) AS n_desc,
       |       CAST(sum(units) AS BIGINT) AS total_units
       |FROM c GROUP BY 1""".stripMargin
  }

  /** The DuckDB oracle for [[linkPredict]] — same canonicalization,
    * deterministic per-center degree cap (identical multiplicative-hash
    * order), wedge counting, non-edge anti-join, and one rounded
    * division. */
  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the diameter-INDEPENDENT sibling of
    * [[graft.ops.TextDedup.dedupClusters]]'s min-label propagation.
    * Label propagation needs O(diameter) rounds: a 10⁶-node path graph
    * (duplicate chains produce exactly these) needs 10⁶ joins. The
    * star algorithm contracts the graph itself — each round rewires
    * every node toward its neighborhood minimum — and provably
    * converges in O(log² n) rounds regardless of diameter (O(log n)
    * observed); a 10⁶-node path finishes in ~20 rounds.
    *
    * Round shape (per op, both are one shuffle + one skew-tolerant
    * join — NO per-node neighbor list is ever materialized, so a
    * 10⁸-degree hub costs a map-side partial min, not an OOM):
    *  - large-star: every node u computes m = min(Γ(u) ∪ u) via
    *    groupBy-min; each STRICTLY LARGER neighbor v > u is rewired to
    *    (v, m). Keeps the invariant that edges only ever point "down".
    *  - small-star: edges oriented (big, small); each node u with its
    *    smaller neighbors computes m = min; all of them and u itself
    *    rewire to (·, m).
    * Convergence = edge-set fixed point, detected by (count,
    * Σ xxhash64(u, v)) equality on the canonicalized set — two scalar
    * aggregates per round, nothing collected. At the fixed point the
    * edge set IS the answer: {(u, component-min) | u not the min}.
    *
    * Memory: each round's edge set is localCheckpoint'ed (lineage cut —
    * see the in-body comment); prior rounds' blocks are released by GC,
    * and since the edge set only shrinks under contraction the live
    * footprint is bounded by ~2 rounds × |edges| of (long, long) pairs.
    *
    * Returns (node, component). Input `edges(src, dst)`; direction and
    * self-loops are ignored. Non-convergence within `maxRounds` throws
    * (partial labels would split components downstream — the
    * [[graft.ops.TextDedup.dedupClusters]] fail-loudly discipline).
    */
  def connectedComponentsStar(spark: SparkSession, edges: DataFrame,
                              maxRounds: Int = 24): DataFrame = {
    val e0 = edges
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist()
    val child = graphSession(edges.sparkSession, e0.count())
    // lineage is truncated EVERY round here (stricter than pageRank's
    // every-4): each round's plan references `e` four times (both sides
    // of the symmetric union, then the join against its own groupBy),
    // so without truncation the logical tree QUADRUPLES per round and
    // analysis/canonicalization — not execution — becomes the
    // bottleneck (4^8 subtrees between every-8 checkpoints, measured in
    // minutes on a 64-node graph). localCheckpoint rebases each round
    // on a LogicalRDD; the checksum forces materialization anyway, so
    // the eager cut is free.
    var e = rebind(child, e0).localCheckpoint(true)
    var prev = (-1L, BigDecimal(-1))
    var sig = checksum(e)
    var round = 0
    while (sig != prev && round < maxRounds) {
      prev = sig
      // large-star: rewire strictly-larger neighbors to the local min
      val both = e.select(col("u"), col("v").as("nbr"))
        .unionByName(e.select(col("v").as("u"), col("u").as("nbr")))
      val lsMin = both.groupBy(col("u"))
        .agg(min(col("nbr")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = both.join(lsMin, "u")
        .filter(col("nbr") > col("u"))
        .select(col("nbr").as("u"), col("m").as("v"))
        .distinct()
      // small-star: nodes and their smaller neighbors all rewire to min
      val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = ls.join(ssMin, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(ssMin.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(true)
      sig = checksum(next)
      e = next
      round += 1
    }
    e0.unpersist()
    if (sig != prev)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge after $maxRounds " +
          "rounds; raise maxRounds")
    // fixed point: e = {(u, component-min)}; representatives and
    // singletons label themselves via the caller's node set
    val labels = e.groupBy(col("u").as("node"))
      .agg(min(col("v")).as("component"))
    rebind(edges.sparkSession, labels)
  }

  /** (row count, Σ xxhash64) fingerprint of a canonical (u, v) edge
    * set — the fixed-point detector for [[connectedComponentsStar]].
    * Exact-integer sum (decimal 38,0): order-independent, no overflow,
    * nothing collected but the 1-row aggregate.
    */
  private def checksum(e: DataFrame): (Long, BigDecimal) = {
    val r = e.agg(count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("u"), col("v"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))), lit(0)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
      .head()
    (r.getLong(0), BigDecimal(r.getDecimal(1)))
  }

  def linkPredictOracleSql(edgesCte: String, minCommon: Long = 2L,
                           maxCenterDegree: Int = 1024): String =
    s"""WITH e0 AS ($edgesCte),
       | ed AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
       |        FROM e0 WHERE a <> b),
       | dir AS (SELECT a AS u, b AS w FROM ed
       |         UNION ALL SELECT b AS u, a AS w FROM ed),
       | deg AS (SELECT u, count(*) AS deg FROM dir GROUP BY 1),
       | capped AS (SELECT w, u FROM (
       |   SELECT w, u, row_number() OVER (PARTITION BY w
       |     ORDER BY (CAST(u AS BIGINT) * 2654435761) % 4294967296, u)
       |     AS rnk FROM dir) WHERE rnk <= $maxCenterDegree),
       | cn AS (SELECT c1.u AS u, c2.u AS v, count(*) AS cn
       |        FROM capped c1 JOIN capped c2
       |          ON c1.w = c2.w AND c1.u < c2.u
       |        GROUP BY 1, 2 HAVING count(*) >= $minCommon),
       | ne AS (SELECT cn.* FROM cn ANTI JOIN ed
       |        ON cn.u = ed.a AND cn.v = ed.b)
       |SELECT ne.u, ne.v, CAST(ne.cn AS BIGINT) AS cn,
       |  CAST(du.deg AS BIGINT) AS deg_u, CAST(dv.deg AS BIGINT) AS deg_v,
       |  round(CAST(ne.cn AS DOUBLE)
       |    / CAST(du.deg + dv.deg - ne.cn AS DOUBLE), 6) AS jaccard
       |FROM ne JOIN deg du ON du.u = ne.u
       |        JOIN deg dv ON dv.u = ne.v""".stripMargin
}
