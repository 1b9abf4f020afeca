package graft.streaming

import graft.operators.Graph
import org.apache.spark.sql.DataFrame

/** Streaming twin of g04's corpus-closing category — the production
  * monitoring shape the incremental accounting exists for: "this new
  * relationship just arrived; how many triangles does it close with
  * what we already know?" A deployment freezes the co-purchase graph
  * (the [[Graph.corpusEdgeIndex]] build, the corpusSeedIndex
  * pattern), and every arriving edge probes it with per-arrival cost
  * O(deg_corpus(x)) — the corpus wedge space is never rescanned.
  *
  * The plan is fully STATELESS (the BloomStream class): the arriving
  * batch joins the corpus's undirected neighbor arrays on each
  * endpoint and intersects them in-core (`explode(array_intersect)`)
  * — the LITERAL shared [[Graph.closedByCorpus]] Column algebra (its
  * r18 adjacency-intersection shape), so the stream and batch g04's
  * tri_1_new cannot drift. The arrival side broadcasts
  * (`probeBounded = true` — micro-batches are bounded by contract);
  * the corpus-side adjacency aggregate is OpCache'd, so the frozen
  * generation's collect_list runs once per session, not once per
  * micro-batch (ADVICE r18 — per-batch cost is O(deg_corpus(x)) per
  * arriving edge again, plus one cached-columnar scan). No state
  * store, no watermark; checkpointed AvailableNow replays terminate
  * normally.
  *
  * Scope is the arrival-vs-corpus category ONLY (the SpanStream /
  * SemStream contract): triangles among the arrivals themselves
  * (g04's 2-new/3-new categories) need cross-arrival state and
  * belong to the batch accounting that runs at the next corpus
  * freeze.
  *
  * TriStreamSpec pins: streamed (x, y, w) rows == batch
  * closedByCorpus rows over the same frozen corpus, and their count
  * == g04's tri_1_new.
  */
object TriStream {

  /** Triangles each arriving (x < y)-canonical edge closes against
    * the frozen corpus edge frame — one output row per closed
    * triangle (x, y, w). */
  def closedTriangles(edges: DataFrame, corpusEdges: DataFrame): DataFrame =
    Graph.closedByCorpus(edges, corpusEdges,
      probeBounded = true, cacheAdj = true)
}
