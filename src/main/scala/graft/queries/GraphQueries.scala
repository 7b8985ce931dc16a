package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Graph analytics over relationship tables — the iterative-join family
  * that complements graft.ops.ConnectedComponents' label propagation.
  *
  * The graph here is the customer↔supplier trading network implied by
  * orders⋈lineitem: a bipartite edge per distinct (customer, supplier)
  * pair, made bidirectional so every node has out-degree ≥ 1 (no
  * dangling-mass correction needed — the rank total stays exactly 1).
  *
  * Scale shape: each PageRank iteration is one shuffle of the edge list
  * joined against the node-sized rank frame, then a map-side-combinable
  * sum per destination — the textbook distributed PageRank data flow.
  * Ranks/degrees are node-cardinality frames (broadcastable below ~10M
  * nodes; hash-joined co-partitioned above). Iterations here are
  * unrolled (3 suffices for the oracle's fixed-iteration contract); a
  * convergence-driven loop would checkpoint the rank frame every few
  * rounds to truncate lineage, exactly as ConnectedComponents does.
  *
  * Numeric parity: per-edge contributions r/deg are double-divided
  * (IEEE-identical on both engines) then CAST to DECIMAL(28,14) before
  * the per-destination sum, so the reduction is exact integer-scaled
  * arithmetic — summation order cannot drift the hash. Ranks are
  * reported normalized (×N, average 1.0) and the top-k ordering keys on
  * the ROUNDED rank so the cutoff is deterministic cross-engine.
  */
object GraphQueries {

  def all: Seq[OracleQuery] = Seq(
    OracleQuery(
      "graph_pagerank",
      (s, d) => {
        import s.implicits._
        val pairs = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .select(
            concat(lit("c"), $"o_custkey").as("src"),
            concat(lit("s"), $"l_suppkey").as("dst"))
          .distinct()
        // The edge list is PERSISTED: every iteration joins against it
        // and deg/nodes derive from it, so an unpersisted chain re-runs
        // the orders⋈lineitem distinct ~8x (measured 3.5x slower on the
        // bench entry). Edge-cardinality, not fact-cardinality — the
        // frame every distributed PageRank keeps resident (or bucketed
        // on disk by src at cluster scale). Values unchanged.
        val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
          .persist()
        val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
        val nodes = deg.select($"src".as("node"), $"deg")
        val nn = nodes.agg(count(lit(1)).cast("double").as("n"))

        var ranks = nodes.crossJoin(nn)
          .select($"node", $"deg", $"n", (lit(1.0) / $"n").as("r"))
        for (_ <- 1 to 3) {
          val contrib = edges
            .join(ranks.select($"node", ($"r" / $"deg").cast("decimal(28,14)").as("c")),
              $"src" === $"node")
            .groupBy($"dst").agg(sum($"c").as("sc"))
          // rank(t) references rank(t-1): persist each step so the
          // lineage is linear in iterations, not quadratic (same replay
          // cut as text_quality_classifier's epoch weights). Node-sized.
          ranks = nodes.crossJoin(nn)
            .join(contrib, $"node" === $"dst", "left")
            .select($"node", $"deg", $"n",
              (lit(0.15) / $"n" + lit(0.85) * coalesce($"sc".cast("double"), lit(0.0)))
                .as("r"))
            .persist()
        }
        ranks
          .select($"node", round($"r" * $"n", 4).as("rank_norm"))
          .orderBy($"rank_norm".desc, $"node")
          .limit(50)
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             |    's' || CAST(l_suppkey AS VARCHAR) AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |), edges AS (
             |  SELECT src, dst FROM pairs
             |  UNION ALL
             |  SELECT dst AS src, src AS dst FROM pairs
             |), deg AS (
             |  SELECT src AS node, count(*) AS deg FROM edges GROUP BY src
             |), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
             |r0 AS (
             |  SELECT node, deg, n, 1.0 / n AS r FROM deg CROSS JOIN nn
             |), c1 AS (
             |  SELECT e.dst, sum(CAST(r.r / r.deg AS DECIMAL(28,14))) AS sc
             |  FROM edges e JOIN r0 r ON e.src = r.node GROUP BY e.dst
             |), r1 AS (
             |  SELECT d.node, d.deg, nn.n,
             |    0.15 / nn.n + 0.85 * coalesce(CAST(c1.sc AS DOUBLE), 0.0) AS r
             |  FROM deg d CROSS JOIN nn LEFT JOIN c1 ON d.node = c1.dst
             |), c2 AS (
             |  SELECT e.dst, sum(CAST(r.r / r.deg AS DECIMAL(28,14))) AS sc
             |  FROM edges e JOIN r1 r ON e.src = r.node GROUP BY e.dst
             |), r2 AS (
             |  SELECT d.node, d.deg, nn.n,
             |    0.15 / nn.n + 0.85 * coalesce(CAST(c2.sc AS DOUBLE), 0.0) AS r
             |  FROM deg d CROSS JOIN nn LEFT JOIN c2 ON d.node = c2.dst
             |), c3 AS (
             |  SELECT e.dst, sum(CAST(r.r / r.deg AS DECIMAL(28,14))) AS sc
             |  FROM edges e JOIN r2 r ON e.src = r.node GROUP BY e.dst
             |), r3 AS (
             |  SELECT d.node, nn.n,
             |    0.15 / nn.n + 0.85 * coalesce(CAST(c3.sc AS DOUBLE), 0.0) AS r
             |  FROM deg d CROSS JOIN nn LEFT JOIN c3 ON d.node = c3.dst
             |)
             |SELECT node, round(r * n, 4) AS rank_norm
             |FROM r3
             |ORDER BY rank_norm DESC, node LIMIT 50""".stripMargin)
    ),

    // BFS reachability layers from the hub (highest-degree node, ties
    // by name): how much of the trading network is within k hops — the
    // "blast radius" question for supply-chain and fraud graphs. Each
    // hop is one frontier⋈edges shuffle plus an anti-join against the
    // visited set — the standard distributed BFS; the frontier/visited
    // frames are node-sized. Unrolled to 3 hops; unreached nodes report
    // as layer −1 so the curve always accounts for every node. On a
    // bipartite graph layers alternate sides, which the spec pins.
    OracleQuery(
      "graph_bfs_layers",
      (s, d) => {
        import s.implicits._
        val pairs = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .select(
            concat(lit("c"), $"o_custkey").as("src"),
            concat(lit("s"), $"l_suppkey").as("dst"))
          .distinct()
        // same persist rationale as graph_pagerank: one materialization
        // of the edge list feeds every hop's frontier join.
        val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
          .persist()
        val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
        val seed = deg.orderBy($"deg".desc, $"src").limit(1)
          .select($"src".as("node"), lit(0).as("layer"))

        // each hop's frontier is PERSISTED (node-sized — the house rule:
        // cache the small derived frame, not the fact): without it the
        // growing `visited` union re-derives every earlier hop once per
        // later reference (hop 3, the unreached anti-join and the final
        // aggregate each replay hops 1–2 — measured 70 s at sf1, ~14 s
        // with the frontiers cached)
        var visited = seed
        var frontier = seed
        for (k <- 1 to 3) {
          val next = edges
            .join(frontier.select($"node".as("f")), $"src" === $"f")
            .select($"dst".as("node")).distinct()
            .join(visited.select($"node".as("v")), $"node" === $"v", "left_anti")
            .select($"node", lit(k).as("layer"))
            .persist()
          visited = visited.union(next)
          frontier = next
        }
        val unreached = deg.select($"src".as("node"))
          .join(visited.select($"node".as("v")), $"node" === $"v", "left_anti")
          .select($"node", lit(-1).as("layer"))
        visited.union(unreached)
          .groupBy($"layer").agg(count(lit(1)).as("n_nodes"))
          .orderBy($"layer")
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             |    's' || CAST(l_suppkey AS VARCHAR) AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |), edges AS (
             |  SELECT src, dst FROM pairs
             |  UNION ALL
             |  SELECT dst AS src, src AS dst FROM pairs
             |), deg AS (
             |  SELECT src AS node, count(*) AS deg FROM edges GROUP BY src
             |), l0 AS (
             |  SELECT node, 0 AS layer FROM deg ORDER BY deg DESC, node LIMIT 1
             |), l1 AS (
             |  SELECT DISTINCT e.dst AS node, 1 AS layer
             |  FROM edges e JOIN l0 ON e.src = l0.node
             |  WHERE e.dst NOT IN (SELECT node FROM l0)
             |), l2 AS (
             |  SELECT DISTINCT e.dst AS node, 2 AS layer
             |  FROM edges e JOIN l1 ON e.src = l1.node
             |  WHERE e.dst NOT IN (SELECT node FROM l0 UNION ALL SELECT node FROM l1)
             |), l3 AS (
             |  SELECT DISTINCT e.dst AS node, 3 AS layer
             |  FROM edges e JOIN l2 ON e.src = l2.node
             |  WHERE e.dst NOT IN (SELECT node FROM l0 UNION ALL SELECT node FROM l1
             |                      UNION ALL SELECT node FROM l2)
             |), vis AS (
             |  SELECT node, layer FROM l0 UNION ALL SELECT node, layer FROM l1
             |  UNION ALL SELECT node, layer FROM l2 UNION ALL SELECT node, layer FROM l3
             |), allv AS (
             |  SELECT node, layer FROM vis
             |  UNION ALL
             |  SELECT d.node, -1 AS layer FROM deg d
             |  WHERE d.node NOT IN (SELECT node FROM vis)
             |)
             |SELECT layer, count(*) AS n_nodes FROM allv
             |GROUP BY layer ORDER BY layer""".stripMargin)
    ),

    // Triangle counting + local clustering coefficients on the part
    // co-purchase graph — the community-structure primitive (fraud
    // rings, product bundles). DEGREE-ORDERED counting (the canonical
    // distributed algorithm): orient every edge from its lower-degree
    // endpoint to the higher ((deg, id) total order), so each triangle
    // is emitted EXACTLY once and — the scale property — the wedge
    // join fans out per node by its ORIENTED out-degree, which is
    // O(√|E|)-bounded for any graph, where the naive wedge join blows
    // up quadratically on hub nodes. Three equi-joins, no theta/
    // cartesian anywhere; the co-purchase edges themselves come from
    // the a-priori-pruned basket pairs (the pipe_market_basket
    // machinery). Counts are exact integers; the clustering
    // coefficient 2t/(d(d−1)) is a row-local division rounded to 4.
    OracleQuery(
      "graph_triangles",
      (s, d) => {
        import s.implicits._
        val items = Tables.lineitem(s, d)
          .select($"l_orderkey".as("k"), $"l_partkey".as("p")).distinct()
        val isup = items.groupBy($"p").agg(count(lit(1)).as("sup"))
          .filter($"sup" >= 20)
        val freq = items.join(broadcast(isup.select($"p")), "p")
        val edges = freq.as("a")
          .join(freq.as("b"),
            col("a.k") === col("b.k") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
          .agg(count(lit(1)).as("c")).filter($"c" >= 2)
          .select($"p1", $"p2")
          .persist() // reused by deg, orientation, and the 3-way join
        val deg = edges.select($"p1".as("p")).union(edges.select($"p2".as("p")))
          .groupBy($"p").agg(count(lit(1)).as("d"))
        val withDeg = edges
          .join(deg.select($"p".as("p1"), $"d".as("d1")), "p1")
          .join(deg.select($"p".as("p2"), $"d".as("d2")), "p2")
        val lower = ($"d1" < $"d2") || ($"d1" === $"d2" && $"p1" < $"p2")
        val ori = withDeg.select(
          when(lower, $"p1").otherwise($"p2").as("a"),
          when(lower, $"p2").otherwise($"p1").as("b"))
          .persist()
        val tri = ori.as("e1")
          .join(ori.as("e2"), col("e2.a") === col("e1.b"))
          .join(ori.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
        val nodeTri = tri.select($"x".as("p")).union(tri.select($"y".as("p")))
          .union(tri.select($"z".as("p")))
          .groupBy($"p").agg(count(lit(1)).as("n_tri"))
        val total = tri.agg(count(lit(1)).as("total_triangles"))
        nodeTri.join(deg, "p").crossJoin(broadcast(total))
          .select($"p", $"d".as("deg"), $"n_tri",
            round(lit(2.0) * $"n_tri" / ($"d" * ($"d" - 1)), 4).as("clustering"),
            $"total_triangles")
          .orderBy($"n_tri".desc, $"p")
          .limit(20)
      },
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
             |), isup AS (
             |  SELECT p FROM items GROUP BY p HAVING count(*) >= 20
             |), freq AS (
             |  SELECT i.k, i.p FROM items i JOIN isup USING (p)
             |), edges AS (
             |  SELECT a.p AS p1, b.p AS p2
             |  FROM freq a JOIN freq b ON a.k = b.k AND a.p < b.p
             |  GROUP BY 1, 2 HAVING count(*) >= 2
             |), deg AS (
             |  SELECT p, count(*) AS d
             |  FROM (SELECT p1 AS p FROM edges UNION ALL SELECT p2 FROM edges)
             |  GROUP BY 1
             |), ori AS (
             |  SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.p1 < e.p2)
             |    THEN e.p1 ELSE e.p2 END AS a,
             |    CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.p1 < e.p2)
             |    THEN e.p2 ELSE e.p1 END AS b
             |  FROM edges e JOIN deg d1 ON e.p1 = d1.p JOIN deg d2 ON e.p2 = d2.p
             |), tri AS (
             |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |  FROM ori e1
             |  JOIN ori e2 ON e2.a = e1.b
             |  JOIN ori e3 ON e3.a = e1.a AND e3.b = e2.b
             |), node_tri AS (
             |  SELECT p, count(*) AS n_tri
             |  FROM (SELECT x AS p FROM tri UNION ALL SELECT y FROM tri
             |        UNION ALL SELECT z FROM tri)
             |  GROUP BY 1
             |), total AS (SELECT count(*) AS total_triangles FROM tri)
             |SELECT p, CAST(d AS BIGINT) AS deg, CAST(n_tri AS BIGINT) AS n_tri,
             |  round(CAST(2.0 AS DOUBLE) * n_tri / (d * (d - 1)), 4) AS clustering,
             |  CAST(total_triangles AS BIGINT) AS total_triangles
             |FROM node_tri JOIN deg USING (p) CROSS JOIN total
             |ORDER BY n_tri DESC, p LIMIT 20""".stripMargin)
    ),

    // Link prediction on the co-purchase graph — which products are
    // NOT yet bought together but should be (the recommendation /
    // assortment primitive): for every distance-2 pair, the three
    // classic scores — common neighbors, neighborhood Jaccard, and
    // Adamic–Adar (Σ 1/ln(deg z) over shared neighbors z, which
    // discounts promiscuous hubs). Scale shape: candidates come from
    // ONE wedge equi-join on the shared middle node, existing edges
    // drop via one anti-join, and every score is a hash aggregate over
    // wedge rows — no cartesian anywhere.
    //
    // HUB CAP (the approximation contract): a raw wedge join is
    // bounded only by Σ deg(z)², and one 10⁵-degree hub product on a
    // 100 TB co-purchase graph would emit 10¹⁰ wedge rows from a
    // single middle node. So each node's neighbor list is capped to
    // its top-HubCap (=64) neighbors by co-purchase count (ties by
    // neighbor id) BEFORE the wedge join — a per-u window rank, one
    // exchange. Wedges are generated Z-CENTRICALLY: candidate pair
    // (a, b) comes from a PAIR within z's own capped list (self-join
    // on the list owner), so z counts as a shared neighbor iff z
    // keeps BOTH endpoints — symmetric in (a, b) by construction (a
    // one-directional spelling like "z ∈ capped(a) ∧ b ∈ capped(z)"
    // would score the same pair differently depending on which
    // endpoint has the smaller id), and per middle node the fan-out
    // is C(≤HubCap, 2) ≤ HubCap²/2 STRICTLY, total ≤
    // HubCap·|E_capped|/2, no matter how skewed the degree
    // distribution (pinned on a synthetic hub graph in GraphOpsSpec
    // and on random graphs in InvariantProps). Degrees (Jaccard
    // denominator, Adamic–Adar ln) are the CAPPED degrees — the cap
    // keeps the strongest edges, which is what the scores weight
    // anyway. The oracle applies the identical cap. A shared z has
    // ≥ 2 kept neighbors by construction (a and b are both in its
    // list), so 1/ln(deg) stays finite.
    //
    // Numeric parity: Adamic–Adar terms are double-divided then
    // DECIMAL(28,14)-cast before the sum (summation-order-exact, the
    // pagerank recipe); display rounding is the build-proof
    // floor(x·10⁴ + 0.5)/10⁴ spelling; top-20 orders on the rounded
    // score with an (a, b) tiebreak — deterministic cross-engine.
    OracleQuery(
      "graph_link_prediction",
      (s, d) => {
        import s.implicits._
        val items = Tables.lineitem(s, d)
          .select($"l_orderkey".as("k"), $"l_partkey".as("p")).distinct()
        val isup = items.groupBy($"p").agg(count(lit(1)).as("sup"))
          .filter($"sup" >= 20)
        val freq = items.join(broadcast(isup.select($"p")), "p")
        val edges = freq.as("a")
          .join(freq.as("b"),
            col("a.k") === col("b.k") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
          .agg(count(lit(1)).as("c")).filter($"c" >= 2)
          .persist()
        val adjW = edges.select($"p1".as("u"), $"p2".as("v"), $"c")
          .union(edges.select($"p2".as("u"), $"p1".as("v"), $"c"))
        val adj = capAdjacency(adjW, HubCap)
        val deg = adj.groupBy($"u").agg(count(lit(1)).as("d"))
        val wedges = adj.as("x")
          .join(adj.as("y"), col("x.u") === col("y.u") && col("x.v") < col("y.v"))
          .select(col("x.v").as("a"), col("y.v").as("b"), col("x.u").as("z"))
        val scored = wedges
          .join(edges.select($"p1".as("a"), $"p2".as("b")), Seq("a", "b"), "left_anti")
          .join(deg.select($"u".as("z"), $"d".as("dz")), "z")
          .groupBy($"a", $"b")
          .agg(
            count(lit(1)).as("cn"),
            (floor(sum((lit(1.0) / log($"dz")).cast("decimal(28,14)"))
              .cast("double") * 10000 + 0.5) / 10000).as("adamic_adar"))
        scored
          .join(deg.select($"u".as("a"), $"d".as("da")), "a")
          .join(deg.select($"u".as("b"), $"d".as("db")), "b")
          .select($"a", $"b", $"cn",
            (floor($"cn" / ($"da" + $"db" - $"cn").cast("double") * 10000 + 0.5)
              / 10000).as("jaccard"),
            $"adamic_adar")
          .orderBy($"adamic_adar".desc, $"a", $"b")
          .limit(20)
      },
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
             |), isup AS (
             |  SELECT p FROM items GROUP BY p HAVING count(*) >= 20
             |), freq AS (
             |  SELECT i.k, i.p FROM items i JOIN isup USING (p)
             |), edges AS (
             |  SELECT a.p AS p1, b.p AS p2, count(*) AS c
             |  FROM freq a JOIN freq b ON a.k = b.k AND a.p < b.p
             |  GROUP BY 1, 2 HAVING count(*) >= 2
             |), adjw AS (
             |  SELECT p1 AS u, p2 AS v, c FROM edges
             |  UNION ALL SELECT p2, p1, c FROM edges
             |), adj AS (
             |  SELECT u, v FROM (
             |    SELECT u, v,
             |      row_number() OVER (PARTITION BY u ORDER BY c DESC, v) AS rk
             |    FROM adjw
             |  ) WHERE rk <= 64
             |), deg AS (
             |  SELECT u, count(*) AS d FROM adj GROUP BY 1
             |), wedges AS (
             |  SELECT x.v AS a, y.v AS b, x.u AS z
             |  FROM adj x JOIN adj y ON x.u = y.u AND x.v < y.v
             |), cand AS (
             |  SELECT w.a, w.b, w.z FROM wedges w
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM edges e WHERE e.p1 = w.a AND e.p2 = w.b)
             |), scored AS (
             |  SELECT c.a, c.b, count(*) AS cn,
             |    floor(CAST(sum(CAST(CAST(1.0 AS DOUBLE) / ln(dz.d)
             |      AS DECIMAL(28,14))) AS DOUBLE) * 10000 + 0.5) / 10000
             |      AS adamic_adar
             |  FROM cand c JOIN deg dz ON c.z = dz.u
             |  GROUP BY 1, 2
             |)
             |SELECT s.a, s.b, CAST(cn AS BIGINT) AS cn,
             |  floor(cn / CAST(da.d + db.d - cn AS DOUBLE) * 10000 + 0.5) / 10000
             |    AS jaccard,
             |  adamic_adar
             |FROM scored s
             |JOIN deg da ON s.a = da.u
             |JOIN deg db ON s.b = db.u
             |ORDER BY adamic_adar DESC, s.a, s.b LIMIT 20""".stripMargin)
    ),

    // k-core decomposition by iterative peeling — the density backbone
    // operator for graph curation (spam rings, co-purchase backbones,
    // citation cores live in high-k cores; low-core nodes are the
    // periphery a sampler drops first). Graph: part co-purchase (parts
    // sharing an order, distinct unordered pairs — homogeneous degrees,
    // unlike the hub-skewed bipartite trading graph, so the peel
    // actually CASCADES: removing weak parts drags borderline parts
    // under K in later rounds; K=80 converges in 6 rounds at sf0.01
    // AND sf0.1 with a non-empty core). Each round is one degree
    // aggregate (a shuffle of the persisted edge list) plus two anti
    // joins against the weak set; rounds are unrolled to a fixed budget
    // with the final round's n_peeled = 0 PROVING the fixpoint in-band
    // (both engines emit the full peel schedule, so a single node
    // peeled in the wrong round fails the hash). At 100 TB the loop
    // runs to fixpoint with the edge frame checkpointed every few
    // rounds (the ConnectedComponents lineage discipline) and the weak
    // set broadcast while it fits. The peel loop lives in ops/KCore —
    // see its scaladoc for the lineage discipline (checkpoint the tiny
    // WEAK set, not the edges: that severs the subtree that re-embeds
    // the edge plan 3x per round and turns exponential plan growth —
    // an OOM on plan RENDERING by round 4 — into two broadcast joins
    // per round); KCoreSpec pins the core property on a hand graph.
    OracleQuery(
      "graph_kcore",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_partkey")
        val edges = li.as("a")
          .join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
          .distinct()
        val sched = graft.ops.KCore.peel(edges, k = 80, rounds = 6)
        sched.stats.toDF("iter", "n_peeled", "n_nodes", "n_edges")
          .orderBy($"iter")
      },
      Some("""WITH e0 AS MATERIALIZED (
             |  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |),
             |d1 AS MATERIALIZED (
             |  SELECT node, count(*) AS deg FROM (
             |    SELECT p1 AS node FROM e0 UNION ALL SELECT p2 FROM e0) t
             |  GROUP BY 1
             |),
             |w1 AS MATERIALIZED (SELECT node FROM d1 WHERE deg < 80),
             |e1 AS MATERIALIZED (
             |  SELECT p1, p2 FROM e0
             |  WHERE p1 NOT IN (SELECT node FROM w1)
             |    AND p2 NOT IN (SELECT node FROM w1)
             |),
             |d2 AS MATERIALIZED (
             |  SELECT node, count(*) AS deg FROM (
             |    SELECT p1 AS node FROM e1 UNION ALL SELECT p2 FROM e1) t
             |  GROUP BY 1
             |),
             |w2 AS MATERIALIZED (SELECT node FROM d2 WHERE deg < 80),
             |e2 AS MATERIALIZED (
             |  SELECT p1, p2 FROM e1
             |  WHERE p1 NOT IN (SELECT node FROM w2)
             |    AND p2 NOT IN (SELECT node FROM w2)
             |),
             |d3 AS MATERIALIZED (
             |  SELECT node, count(*) AS deg FROM (
             |    SELECT p1 AS node FROM e2 UNION ALL SELECT p2 FROM e2) t
             |  GROUP BY 1
             |),
             |w3 AS MATERIALIZED (SELECT node FROM d3 WHERE deg < 80),
             |e3 AS MATERIALIZED (
             |  SELECT p1, p2 FROM e2
             |  WHERE p1 NOT IN (SELECT node FROM w3)
             |    AND p2 NOT IN (SELECT node FROM w3)
             |),
             |d4 AS MATERIALIZED (
             |  SELECT node, count(*) AS deg FROM (
             |    SELECT p1 AS node FROM e3 UNION ALL SELECT p2 FROM e3) t
             |  GROUP BY 1
             |),
             |w4 AS MATERIALIZED (SELECT node FROM d4 WHERE deg < 80),
             |e4 AS MATERIALIZED (
             |  SELECT p1, p2 FROM e3
             |  WHERE p1 NOT IN (SELECT node FROM w4)
             |    AND p2 NOT IN (SELECT node FROM w4)
             |),
             |d5 AS MATERIALIZED (
             |  SELECT node, count(*) AS deg FROM (
             |    SELECT p1 AS node FROM e4 UNION ALL SELECT p2 FROM e4) t
             |  GROUP BY 1
             |),
             |w5 AS MATERIALIZED (SELECT node FROM d5 WHERE deg < 80),
             |e5 AS MATERIALIZED (
             |  SELECT p1, p2 FROM e4
             |  WHERE p1 NOT IN (SELECT node FROM w5)
             |    AND p2 NOT IN (SELECT node FROM w5)
             |),
             |d6 AS MATERIALIZED (
             |  SELECT node, count(*) AS deg FROM (
             |    SELECT p1 AS node FROM e5 UNION ALL SELECT p2 FROM e5) t
             |  GROUP BY 1
             |),
             |w6 AS MATERIALIZED (SELECT node FROM d6 WHERE deg < 80),
             |e6 AS MATERIALIZED (
             |  SELECT p1, p2 FROM e5
             |  WHERE p1 NOT IN (SELECT node FROM w6)
             |    AND p2 NOT IN (SELECT node FROM w6)
             |)
             |SELECT 1 AS iter, (SELECT count(*) FROM w1) AS n_peeled,
             |  (SELECT count(*) FROM (
             |     SELECT p1 AS n FROM e1 UNION SELECT p2 FROM e1) t) AS n_nodes,
             |  (SELECT count(*) FROM e1) AS n_edges
             |UNION ALL
             |SELECT 2 AS iter, (SELECT count(*) FROM w2) AS n_peeled,
             |  (SELECT count(*) FROM (
             |     SELECT p1 AS n FROM e2 UNION SELECT p2 FROM e2) t) AS n_nodes,
             |  (SELECT count(*) FROM e2) AS n_edges
             |UNION ALL
             |SELECT 3 AS iter, (SELECT count(*) FROM w3) AS n_peeled,
             |  (SELECT count(*) FROM (
             |     SELECT p1 AS n FROM e3 UNION SELECT p2 FROM e3) t) AS n_nodes,
             |  (SELECT count(*) FROM e3) AS n_edges
             |UNION ALL
             |SELECT 4 AS iter, (SELECT count(*) FROM w4) AS n_peeled,
             |  (SELECT count(*) FROM (
             |     SELECT p1 AS n FROM e4 UNION SELECT p2 FROM e4) t) AS n_nodes,
             |  (SELECT count(*) FROM e4) AS n_edges
             |UNION ALL
             |SELECT 5 AS iter, (SELECT count(*) FROM w5) AS n_peeled,
             |  (SELECT count(*) FROM (
             |     SELECT p1 AS n FROM e5 UNION SELECT p2 FROM e5) t) AS n_nodes,
             |  (SELECT count(*) FROM e5) AS n_edges
             |UNION ALL
             |SELECT 6 AS iter, (SELECT count(*) FROM w6) AS n_peeled,
             |  (SELECT count(*) FROM (
             |     SELECT p1 AS n FROM e6 UNION SELECT p2 FROM e6) t) AS n_nodes,
             |  (SELECT count(*) FROM e6) AS n_edges
             |ORDER BY iter""".stripMargin)
    ),

    // Label-propagation community detection (ops/LabelPropagation) on
    // the support-pruned co-purchase graph — the near-linear community
    // algorithm for product assortment / fraud-ring discovery. Four
    // synchronous rounds; each node adopts its neighbors' most frequent
    // label with the DETERMINISTIC (count desc, label asc) tie-break,
    // packed into one exact integer argmax key cnt·2²⁴−lbl so the
    // per-node choice is a plain max() hash aggregate both engines
    // replay bit-identically (classic LPA's arrival-order tie resolution
    // is shuffle-nondeterministic — unreplayable AND unreproducible
    // across the same engine's runs). Output is the community census
    // (members, internal edges, degree mass — the exact-integer inputs
    // to modularity, which the spec computes). Scale: per round one
    // edges⋈labels hash join + two hash aggs; labels (node-bounded) are
    // the checkpointed frame, edges stay lazy (the k-core recipe).
    OracleQuery(
      "graph_label_propagation",
      (s, d) => {
        import s.implicits._
        lpaCensus(s, d)._1
          .orderBy($"n_members".desc, $"lbl")
      },
      Some(s"""$lpaCensusSql
             |SELECT m.lbl, CAST(m.n_members AS BIGINT) AS n_members,
             |  CAST(COALESCE(ew.e_within, 0) AS BIGINT) AS e_within,
             |  CAST(dt.d_total AS BIGINT) AS d_total
             |FROM mem m LEFT JOIN ew USING (lbl) JOIN dt USING (lbl)
             |ORDER BY n_members DESC, lbl""".stripMargin)
    ),

    // Modularity of the LPA partition (graph_modularity) — the "was
    // that clustering any good" number the census begs for: Newman's
    // Q = Σ_c (e_c/m − (d_c/2m)²) over the SAME communities, edges and
    // degree masses graph_label_propagation emits. All inputs are the
    // census's exact integers; each community's term is an IEEE
    // expression of them QUANTIZED to a 1e-12 long before the
    // cross-community sum (the a49 re-quantize discipline — a plain
    // double Σ over communities would be summation-order-dependent),
    // so the reduction is exact integer algebra and Q is identical
    // bit-for-bit on both engines before the display floor.
    OracleQuery(
      "graph_modularity",
      (s, d) => {
        import s.implicits._
        val (census, mFrame) = lpaCensus(s, d)
        census.crossJoin(broadcast(mFrame))
          .withColumn("term", floor(
            ($"e_within".cast("double") / $"m"
              - ($"d_total".cast("double") / (lit(2.0) * $"m"))
                * ($"d_total".cast("double") / (lit(2.0) * $"m"))) * 1e12 + 0.5)
            .cast("long"))
          .groupBy()
          .agg(max($"m").as("m_edges"), count(lit(1)).as("n_communities"),
            sum($"term").as("tq"))
          .select($"m_edges".cast("long").as("m_edges"),
            $"n_communities".cast("long").as("n_communities"),
            graft.core.Parity.floorRound4($"tq".cast("double") / 1e12).as("q"))
      },
      Some(s"""$lpaCensusSql, mt AS (
             |  SELECT count(*) AS m FROM e
             |), terms AS (
             |  SELECT CAST(floor((CAST(COALESCE(ew.e_within, 0) AS DOUBLE) / mt.m
             |    - (CAST(dt.d_total AS DOUBLE) / (2.0 * mt.m))
             |      * (CAST(dt.d_total AS DOUBLE) / (2.0 * mt.m)))
             |    * 1000000000000.0 + 0.5) AS BIGINT) AS t, mt.m AS m
             |  FROM mem m LEFT JOIN ew USING (lbl) JOIN dt USING (lbl)
             |  CROSS JOIN mt
             |)
             |SELECT CAST(max(m) AS BIGINT) AS m_edges,
             |  CAST(count(*) AS BIGINT) AS n_communities,
             |  floor(CAST(sum(t) AS DOUBLE) / 1000000000000.0 * 10000 + 0.5) / 10000 AS q
             |FROM terms""".stripMargin)
    ),

    // Degree assortativity (graph_assortativity) — Newman's r: the
    // Pearson correlation of endpoint degrees over the edge list. Hubs
    // preferring hubs (r > 0, social-graph shape) vs hubs bridging
    // low-degree leaves (r < 0, dependency/co-purchase shape) changes
    // which mitigations matter at scale: a disassortative graph
    // concentrates wedge fan-out in hub-leaf stars — exactly the
    // candidate volumes the hub-capped joins bound. One degree
    // aggregate + one edge⋈degree join; every moment (Σdu, Σdu²,
    // Σdudv) is an EXACT integer sum over the symmetrized edge list,
    // so r is IEEE arithmetic on five longs — bit-identical both
    // engines before the display floor. nullif guards the
    // degree-regular graph (zero variance ⇒ r undefined ⇒ NULL).
    OracleQuery(
      "graph_assortativity",
      (s, d) => {
        import s.implicits._
        val edges = coPurchaseEdges(s, d)
        val dirE = edges.select($"p1".as("u"), $"p2".as("v"))
          .union(edges.select($"p2".as("u"), $"p1".as("v")))
        val deg = dirE.groupBy($"u".as("node")).agg(count(lit(1)).as("dg"))
        val pairs = dirE
          .join(deg.select($"node".as("u"), $"dg".as("du")), "u")
          .join(deg.select($"node".as("v"), $"dg".as("dv")), "v")
        pairs.agg(
            count(lit(1)).as("n"),
            sum($"du").as("sx"), sum($"dv").as("sy"),
            sum($"du" * $"du").as("sxx"), sum($"dv" * $"dv").as("syy"),
            sum($"du" * $"dv").as("sxy"))
          .select(
            ($"n" / 2).cast("long").as("m_edges"),
            graft.core.Parity.floorRound4(
              ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
                (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
                  sqrt(nullif(($"n" * $"syy" - $"sy" * $"sy").cast("double"), lit(0.0)))))
              .as("assortativity"))
      },
      Some("""WITH items AS MATERIALIZED (
             |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
             |), isup AS (
             |  SELECT p FROM items GROUP BY p HAVING count(*) >= 20
             |), e AS MATERIALIZED (
             |  SELECT a.p AS p1, b.p AS p2
             |  FROM (SELECT i.k, i.p FROM items i JOIN isup USING (p)) a
             |  JOIN (SELECT i.k, i.p FROM items i JOIN isup USING (p)) b
             |    ON a.k = b.k AND a.p < b.p
             |  GROUP BY 1, 2 HAVING count(*) >= 2
             |), dir AS MATERIALIZED (
             |  SELECT p1 AS u, p2 AS v FROM e
             |  UNION ALL SELECT p2, p1 FROM e
             |), deg AS (
             |  SELECT u AS node, count(*) AS dg FROM dir GROUP BY 1
             |), pairs AS (
             |  SELECT du.dg AS du, dv.dg AS dv
             |  FROM dir JOIN deg du ON dir.u = du.node
             |  JOIN deg dv ON dir.v = dv.node
             |), agg AS (
             |  SELECT count(*) AS n, sum(du) AS sx, sum(dv) AS sy,
             |    sum(du * du) AS sxx, sum(dv * dv) AS syy,
             |    sum(du * dv) AS sxy
             |  FROM pairs
             |)
             |SELECT CAST(n / 2 AS BIGINT) AS m_edges,
             |  floor(CAST(n * sxy - sx * sy AS DOUBLE)
             |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             |       * sqrt(nullif(CAST(n * syy - sy * sy AS DOUBLE), 0.0)))
             |    * 10000 + 0.5) / 10000 AS assortativity
             |FROM agg""".stripMargin)
    ),

    // HITS hubs & authorities (Kleinberg) — the DIRECTED spectral pair
    // beside PageRank's single score: on the customer→supplier order
    // graph, a hub is a customer whose orders concentrate on strong
    // suppliers, an authority a supplier ordered by strong customers —
    // the two-sided influence question PageRank's random surfer
    // collapses. Two unrolled mutual-reinforcement rounds, each an
    // edge-grain shuffle (a(s) = Σ h(c), h(c) = Σ a(s)) with L1
    // normalization; score sums ride DECIMAL(28,14) so accumulation
    // order cannot move a bit (the PageRank contrib discipline). Edge
    // list persisted once — iteration joins are edge-cardinality.
    // Display ranks by the 1e8-quantized score (textrank discipline).
    OracleQuery(
      "graph_hits",
      (s, d) => {
        import s.implicits._
        val edges = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .select($"o_custkey".as("c"), $"l_suppkey".as("sp"))
          .distinct()
          .persist()
        // Persist-and-leak (the pagerank/bfs convention for lazy
        // builders): the old `try { … } finally edges.unpersist()`
        // deregistered the edge cache at BUILD time — before the caller
        // ever evaluated the returned frame — so the persist was a
        // no-op and every reference recomputed orders⋈lineitem+distinct
        // from scratch. Each round's RAW frame is also node-grain
        // persisted: raw feeds both its own L1 total and the normalized
        // scores, and a2/h2 are each referenced twice (next round + the
        // output union), so the uncached tree re-ran the edge joins
        // ~16× at evaluation.
        // round 1: h0 = 1 ⟹ a1_raw(s) = indegree(s)
        val a1raw = edges.groupBy($"sp").agg(count(lit(1)).cast("double").as("ar"))
          .persist()
        val a1tot = a1raw.agg(sum($"ar".cast("decimal(28,14)")).cast("double").as("at"))
        val a1 = a1raw.crossJoin(broadcast(a1tot)).select($"sp", ($"ar" / $"at").as("a"))
        val h1raw = edges.join(a1, "sp")
          .groupBy($"c").agg(sum($"a".cast("decimal(28,14)")).cast("double").as("hr"))
          .persist()
        val h1tot = h1raw.agg(sum($"hr".cast("decimal(28,14)")).cast("double").as("ht"))
        val h1 = h1raw.crossJoin(broadcast(h1tot)).select($"c", ($"hr" / $"ht").as("h"))
        // round 2
        val a2raw = edges.join(h1, "c")
          .groupBy($"sp").agg(sum($"h".cast("decimal(28,14)")).cast("double").as("ar"))
          .persist()
        val a2tot = a2raw.agg(sum($"ar".cast("decimal(28,14)")).cast("double").as("at"))
        val a2 = a2raw.crossJoin(broadcast(a2tot)).select($"sp", ($"ar" / $"at").as("a"))
        val h2raw = edges.join(a2, "sp")
          .groupBy($"c").agg(sum($"a".cast("decimal(28,14)")).cast("double").as("hr"))
          .persist()
        val h2tot = h2raw.agg(sum($"hr".cast("decimal(28,14)")).cast("double").as("ht"))
        val h2 = h2raw.crossJoin(broadcast(h2tot)).select($"c", ($"hr" / $"ht").as("h"))
        val out = a2.select(lit("auth").as("side"),
            concat(lit("s"), $"sp").as("node"), $"a".as("score"))
          .unionByName(h2.select(lit("hub").as("side"),
            concat(lit("c"), $"c").as("node"), $"h".as("score")))
          .withColumn("sq", floor($"score" * 100000000.0 + 0.5).cast("long"))
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"side").orderBy($"sq".desc, $"node")
        out.withColumn("rn", row_number().over(w))
          .filter($"rn" <= 15)
          .select($"side", $"rn", $"node",
            graft.core.Parity.floorRound4($"score" * 1000.0).as("score_k"))
          .orderBy($"side", $"rn")
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |), a1r AS (
             |  SELECT sp, CAST(count(*) AS DOUBLE) AS ar FROM e GROUP BY sp
             |), a1t AS (
             |  SELECT CAST(sum(CAST(ar AS DECIMAL(28,14))) AS DOUBLE) AS at FROM a1r
             |), a1 AS (
             |  SELECT sp, ar / at AS a FROM a1r CROSS JOIN a1t
             |), h1r AS (
             |  SELECT e.c, CAST(sum(CAST(a1.a AS DECIMAL(28,14))) AS DOUBLE) AS hr
             |  FROM e JOIN a1 USING (sp) GROUP BY e.c
             |), h1t AS (
             |  SELECT CAST(sum(CAST(hr AS DECIMAL(28,14))) AS DOUBLE) AS ht FROM h1r
             |), h1 AS (
             |  SELECT c, hr / ht AS h FROM h1r CROSS JOIN h1t
             |), a2r AS (
             |  SELECT e.sp, CAST(sum(CAST(h1.h AS DECIMAL(28,14))) AS DOUBLE) AS ar
             |  FROM e JOIN h1 USING (c) GROUP BY e.sp
             |), a2t AS (
             |  SELECT CAST(sum(CAST(ar AS DECIMAL(28,14))) AS DOUBLE) AS at FROM a2r
             |), a2 AS (
             |  SELECT sp, ar / at AS a FROM a2r CROSS JOIN a2t
             |), h2r AS (
             |  SELECT e.c, CAST(sum(CAST(a2.a AS DECIMAL(28,14))) AS DOUBLE) AS hr
             |  FROM e JOIN a2 USING (sp) GROUP BY e.c
             |), h2t AS (
             |  SELECT CAST(sum(CAST(hr AS DECIMAL(28,14))) AS DOUBLE) AS ht FROM h2r
             |), h2 AS (
             |  SELECT c, hr / ht AS h FROM h2r CROSS JOIN h2t
             |), u AS (
             |  SELECT 'auth' AS side, 's' || CAST(sp AS VARCHAR) AS node, a AS score FROM a2
             |  UNION ALL
             |  SELECT 'hub', 'c' || CAST(c AS VARCHAR), h FROM h2
             |), r AS (
             |  SELECT side, node, score,
             |    CAST(floor(score * 100000000.0 + 0.5) AS BIGINT) AS sq,
             |    CAST(row_number() OVER (PARTITION BY side
             |      ORDER BY CAST(floor(score * 100000000.0 + 0.5) AS BIGINT) DESC, node)
             |      AS INT) AS rn
             |  FROM u
             |)
             |SELECT side, rn, node,
             |  floor(score * 1000.0 * 10000 + 0.5) / 10000 AS score_k
             |FROM r WHERE rn <= 15 ORDER BY side, rn""".stripMargin)
    ),

    // Bounded-hop weighted shortest paths (graph_sssp) — distributed
    // Bellman–Ford from the hub node: each round relaxes EVERY edge at
    // once (one frontier⋈edges shuffle + a per-node min — the
    // map-side-combinable min makes the round the same plan shape as a
    // PageRank iteration), unrolled to 3 rounds = exact cheapest cost
    // over all ≤3-edge paths. That bounded-hop contract is the honest
    // production framing (supply-chain "cost to reach within k tiers");
    // full convergence loops the same round diameter times with the
    // frontier checkpointed (the ConnectedComponents discipline).
    // Edge weight = the pair's min l_quantity — an exact integer, so
    // every relaxed distance is an exact long and min-resolution is
    // total. Frames: edges (pair grain), dist (node grain), both
    // shuffle on uniform keys; nothing row-grain survives the first
    // distinct. Output is the dist histogram + deterministic witness.
    OracleQuery(
      "graph_sssp",
      (s, d) => {
        import s.implicits._
        val pairs = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .groupBy(
            concat(lit("c"), $"o_custkey").as("src"),
            concat(lit("s"), $"l_suppkey").as("dst"))
          .agg(min($"l_quantity").cast("long").as("w"))
        val edges = pairs
          .union(pairs.select($"dst".as("src"), $"src".as("dst"), $"w"))
          .persist()
        val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
        val seed = deg.orderBy($"deg".desc, $"src").limit(1)
          .select($"src".as("node"), lit(0L).as("dist"))
        var dist = seed
        for (_ <- 1 to 3) {
          val relax = edges
            .join(dist.select($"node".as("f"), $"dist".as("df")), $"src" === $"f")
            .select($"dst".as("node"), ($"df" + $"w").as("dist"))
          // persist each round's node-sized dist frame (the
          // graph_bfs_layers discipline): dist(r) references dist(r−1)
          // TWICE (the union carry + the relax join), so an unpersisted
          // 3-round chain evaluates 2³−1 = 7 relax joins — each a full
          // shuffle of the persisted edge list — instead of 3. NO
          // build-time unpersist (the pagerank/bfs convention): this
          // builder returns a LAZY frame, so an unpersist here would
          // deregister every cache before the caller ever evaluates —
          // exactly the bug the old `edges.unpersist()` on the line
          // below the loop used to have (the edge persist was a no-op
          // and all 7 relax joins recomputed orders⋈lineitem from
          // scratch).
          dist = dist.union(relax).groupBy($"node").agg(min($"dist").as("dist"))
            .persist()
        }
        dist.groupBy($"dist")
          .agg(count(lit(1)).as("n_nodes"), min($"node").as("witness"))
          .orderBy($"dist")
      },
      Some("""WITH pairs AS MATERIALIZED (
             |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             |    's' || CAST(l_suppkey AS VARCHAR) AS dst,
             |    CAST(min(l_quantity) AS BIGINT) AS w
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |  GROUP BY 1, 2
             |), edges AS MATERIALIZED (
             |  SELECT src, dst, w FROM pairs
             |  UNION ALL
             |  SELECT dst, src, w FROM pairs
             |), deg AS MATERIALIZED (
             |  SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1
             |), d0 AS MATERIALIZED (
             |  SELECT node, CAST(0 AS BIGINT) AS dist FROM deg
             |  ORDER BY deg DESC, node LIMIT 1
             |), d1 AS MATERIALIZED (
             |  SELECT node, min(dist) AS dist FROM (
             |    SELECT node, dist FROM d0
             |    UNION ALL
             |    SELECT e.dst AS node, d0.dist + e.w AS dist
             |    FROM edges e JOIN d0 ON e.src = d0.node
             |  ) GROUP BY 1
             |), d2 AS MATERIALIZED (
             |  SELECT node, min(dist) AS dist FROM (
             |    SELECT node, dist FROM d1
             |    UNION ALL
             |    SELECT e.dst AS node, d1.dist + e.w AS dist
             |    FROM edges e JOIN d1 ON e.src = d1.node
             |  ) GROUP BY 1
             |), d3 AS MATERIALIZED (
             |  SELECT node, min(dist) AS dist FROM (
             |    SELECT node, dist FROM d2
             |    UNION ALL
             |    SELECT e.dst AS node, d2.dist + e.w AS dist
             |    FROM edges e JOIN d2 ON e.src = d2.node
             |  ) GROUP BY 1
             |)
             |SELECT dist, count(*) AS n_nodes, min(node) AS witness
             |FROM d3 GROUP BY 1 ORDER BY 1""".stripMargin)
    )
  )

  /** The support-pruned co-purchase edge list (p1 < p2) — shared by the
    * LPA family and the degree-mixing metric. Persisted AND memoized per
    * (application, data dir): three entries reading the same graph in
    * one Verify/Bench session would otherwise each pin their own
    * identical cached copy for the session's lifetime. */
  private val edgeCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  private def coPurchaseEdges(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    edgeCache.computeIfAbsent(s.sparkContext.applicationId + "|" + d,
      _ => buildCoPurchaseEdges(s, d))

  private def buildCoPurchaseEdges(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    val isup = items.groupBy(col("p")).agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 20)
    val freq = items.join(broadcast(isup.select(col("p"))), "p")
    freq.as("a")
      .join(freq.as("b"),
        col("a.k") === col("b.k") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("p1"), col("p2"))
      .persist()
  }

  /** Shared Spark pipeline for the LPA family: the deterministic
    * 4-round label propagation over the co-purchase graph, reduced to
    * the community census (lbl, n_members, e_within, d_total) — the
    * exact-integer inputs to modularity — plus the 1-row edge count.
    * See graph_label_propagation's design notes. */
  private def lpaCensus(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val edges = coPurchaseEdges(s, d)
    val labels = graft.ops.LabelPropagation.run(edges, rounds = 4)
    val dir = edges.select(col("p1").as("node"))
      .union(edges.select(col("p2").as("node")))
    val deg = dir.groupBy(col("node")).agg(count(lit(1)).as("dg"))
    val mem = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
    val ew = edges
      .join(labels.select(col("node").as("p1"), col("lbl").as("l1")), "p1")
      .join(labels.select(col("node").as("p2"), col("lbl").as("l2")), "p2")
      .filter(col("l1") === col("l2"))
      .groupBy(col("l1").as("lbl")).agg(count(lit(1)).as("e_within"))
    val dt = deg.join(labels, "node")
      .groupBy(col("lbl")).agg(sum(col("dg")).as("d_total"))
    val census = mem.join(ew, Seq("lbl"), "left").na.fill(0L, Seq("e_within"))
      .join(dt, "lbl")
      .select(col("lbl"), col("n_members"), col("e_within"), col("d_total"))
    (census, edges.agg(count(lit(1)).as("m")))
  }

  /** Shared DuckDB CTE chain for the LPA family: builds `e` (edges),
    * `l4` (round-4 labels), `deg`, and the census legs `mem`/`ew`/`dt`.
    * Callers append their final SELECT (and any extra CTEs). */
  private val lpaCensusSql: String =
    """WITH items AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
      |), isup AS (
      |  SELECT p FROM items GROUP BY p HAVING count(*) >= 20
      |), e AS MATERIALIZED (
      |  SELECT a.p AS p1, b.p AS p2
      |  FROM (SELECT i.k, i.p FROM items i JOIN isup USING (p)) a
      |  JOIN (SELECT i.k, i.p FROM items i JOIN isup USING (p)) b
      |    ON a.k = b.k AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |), dir AS MATERIALIZED (
      |  SELECT p1 AS src, p2 AS dst FROM e
      |  UNION ALL SELECT p2, p1 FROM e
      |), l0 AS MATERIALIZED (
      |  SELECT DISTINCT src AS node, src AS lbl FROM dir
      |), l1 AS MATERIALIZED (
      |  SELECT dst AS node,
      |    (16777216 - max(cnt * 16777216 - lbl) % 16777216) % 16777216 AS lbl
      |  FROM (SELECT d.dst, l.lbl, count(*) AS cnt
      |        FROM dir d JOIN l0 l ON d.src = l.node GROUP BY 1, 2)
      |  GROUP BY dst
      |), l2 AS MATERIALIZED (
      |  SELECT dst AS node,
      |    (16777216 - max(cnt * 16777216 - lbl) % 16777216) % 16777216 AS lbl
      |  FROM (SELECT d.dst, l.lbl, count(*) AS cnt
      |        FROM dir d JOIN l1 l ON d.src = l.node GROUP BY 1, 2)
      |  GROUP BY dst
      |), l3 AS MATERIALIZED (
      |  SELECT dst AS node,
      |    (16777216 - max(cnt * 16777216 - lbl) % 16777216) % 16777216 AS lbl
      |  FROM (SELECT d.dst, l.lbl, count(*) AS cnt
      |        FROM dir d JOIN l2 l ON d.src = l.node GROUP BY 1, 2)
      |  GROUP BY dst
      |), l4 AS MATERIALIZED (
      |  SELECT dst AS node,
      |    (16777216 - max(cnt * 16777216 - lbl) % 16777216) % 16777216 AS lbl
      |  FROM (SELECT d.dst, l.lbl, count(*) AS cnt
      |        FROM dir d JOIN l3 l ON d.src = l.node GROUP BY 1, 2)
      |  GROUP BY dst
      |), deg AS (
      |  SELECT src AS node, count(*) AS dg FROM dir GROUP BY 1
      |), mem AS (
      |  SELECT lbl, count(*) AS n_members FROM l4 GROUP BY 1
      |), ew AS (
      |  SELECT a.lbl, count(*) AS e_within
      |  FROM e JOIN l4 a ON e.p1 = a.node JOIN l4 b ON e.p2 = b.node
      |  WHERE a.lbl = b.lbl GROUP BY 1
      |), dt AS (
      |  SELECT l.lbl, sum(g.dg) AS d_total
      |  FROM deg g JOIN l4 l ON g.node = l.node GROUP BY 1
      |)""".stripMargin


  /** Per-middle-node fan-out bound for wedge joins: keep each node's
    * top-`n` neighbors by edge weight (desc, neighbor-id tiebreak) — a
    * single per-u window rank. Generating candidate pairs z-centrically
    * (pairs within z's own capped list) bounds every middle node at
    * C(n, 2) ≤ n²/2 wedges and the total at n·|E_capped|/2 regardless
    * of degree skew — the guard that keeps the distance-2 join alive
    * on a graph with 10⁵-degree hubs.
    * Input columns: u, v, c (edge weight); output: u, v. */
  private[graft] def capAdjacency(
      adjW: org.apache.spark.sql.DataFrame, n: Int): org.apache.spark.sql.DataFrame = {
    val byWeight = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("c").desc, col("v"))
    adjW.withColumn("rk", row_number().over(byWeight))
      .filter(col("rk") <= n).select(col("u"), col("v"))
  }

  /** Neighbor-list cap for the link-prediction wedge join (the
    * documented approximation contract — top-64 by co-purchase count). */
  private[graft] val HubCap = 64

  /** Candidate-volume telemetry for the bench: the EXACT intermediate
    * row counts the three quadratic-adjacent joins generate — the
    * degree-oriented triangle wedge join, the hub-capped
    * link-prediction wedge join, and the market-basket per-basket pair
    * join (same pruned co-purchase graph, built once here). Wall time
    * hides fan-out growth behind CPU headroom at small scale factors;
    * these counts expose it directly (`*_cands` rows in BENCH json). */
  private[graft] def candidateCounts(
      s: org.apache.spark.sql.SparkSession, d: String): Seq[(String, Long)] = {
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    val isup = items.groupBy(col("p")).agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 20)
    val freq = items.join(broadcast(isup.select(col("p"))), "p")
    // ONE pair self-join serves both numbers: the pre-threshold
    // aggregate's Σc IS the basket-pair candidate count
    // (C(frequent-in-basket, 2) summed over baskets), and its c ≥ 2
    // filtrate is the edge list — running the quadratic join twice
    // would double the section's dominant cost
    val pairAgg = freq.as("a")
      .join(freq.as("b"), col("a.k") === col("b.k") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("c"))
      .persist()
    var adj: org.apache.spark.sql.DataFrame = null
    try {
      // sum() over an empty pairAgg is NULL — coalesce so a layout
      // where no pair reaches the support threshold reports 0, not NPE
      val basketPairs = pairAgg
        .agg(coalesce(sum(col("c")), lit(0L))).collect()(0).getLong(0)
      val edges = pairAgg.filter(col("c") >= 2)
      val deg = edges.select(col("p1").as("p")).union(edges.select(col("p2").as("p")))
        .groupBy(col("p")).agg(count(lit(1)).as("d"))
      val withDeg = edges
        .join(deg.select(col("p").as("p1"), col("d").as("d1")), "p1")
        .join(deg.select(col("p").as("p2"), col("d").as("d2")), "p2")
      val lower = (col("d1") < col("d2")) ||
        (col("d1") === col("d2") && col("p1") < col("p2"))
      val ori = withDeg.select(
        when(lower, col("p1")).otherwise(col("p2")).as("a"),
        when(lower, col("p2")).otherwise(col("p1")).as("b"))
      // triangles: oriented wedges probed before the closing edge join
      val triWedges = ori.as("e1")
        .join(ori.as("e2"), col("e2.a") === col("e1.b")).count()
      val adjW = edges.select(col("p1").as("u"), col("p2").as("v"), col("c"))
        .union(edges.select(col("p2").as("u"), col("p1").as("v"), col("c")))
      adj = capAdjacency(adjW, HubCap).persist()
      // link prediction: capped z-centric distance-2 wedges pre-anti-join
      val lpWedges = adj.as("x")
        .join(adj.as("y"), col("x.u") === col("y.u") && col("x.v") < col("y.v"))
        .count()
      Seq(
        "pipe_market_basket_cands" -> basketPairs,
        "graph_triangles_cands" -> triWedges,
        "graph_link_prediction_cands" -> lpWedges)
    } finally {
      pairAgg.unpersist()
      if (adj != null) adj.unpersist()
    }
  }
}
