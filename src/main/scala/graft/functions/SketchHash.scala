package graft.functions

/** The two splitmix64 finalizer rounds shared by every sketch
  * (Kirsch-Mitzenmacher: cell/bit_i = (mix1 + i*mix2) mod m). ONE
  * implementation on purpose — [[Bloom]] and [[CountMin]] must stay
  * in the same hash family or "build with one, probe with the other"
  * bugs become silent.
  */
private[functions] object SketchHash {

  def mix1(key: Long): Long = {
    var z = key + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def mix2(key: Long): Long = {
    // second independent finalizer round over the first
    var z = mix1(key) + 0x94d049bb133111ebL
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
