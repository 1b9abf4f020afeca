package graft

/** Single bit-loop Morton reference shared by every suite that
  * checks `Compaction.zorderKey` — one oracle implementation, no
  * drift between copies. */
object MortonRef {
  def spread(x: Long): Long =
    (0 until 32).foldLeft(0L)((acc, i) => acc | (((x >> i) & 1L) << (2 * i)))
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
