package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decodeBatch produces typed features per media row") {
    val media = Multimodal.mediaTable(spark, sf)
    val decoded = Multimodal.decodeBatch(media)
    assert(decoded.schema.fieldNames.toSeq ===
      Seq("doc_id", "width", "height", "n_frames", "mean_luma"))
    val n = media.count()
    assert(decoded.count() === n)
    // deterministic: same input -> same features
    val a = decoded.orderBy("doc_id").collect()
    val b = Multimodal.decodeBatch(media).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    // features are derived from real byte content
    val row = decoded.orderBy("doc_id").first()
    assert(row.getInt(1) >= 16 && row.getInt(2) >= 16)
    assert(row.getDouble(4) > 0.0)
  }

  test("fakeDecode is stable and total") {
    val d1 = Multimodal.fakeDecode(7L, "hello world".getBytes)
    val d2 = Multimodal.fakeDecode(7L, "hello world".getBytes)
    assert(d1 === d2)
    val empty = Multimodal.fakeDecode(1L, Array.emptyByteArray)
    assert(empty.meanLuma === 0.0)
  }
}
