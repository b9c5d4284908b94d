package graft.ops

/** Collision-free transient column names: operators that add internal
  * working columns must never clobber a caller's column of the same
  * name (ADVICE r01: hardcoded `__rn` overwrote user data). */
object Names {

  /** A name starting with `__base` that is absent from `taken`. */
  def fresh(base: String, taken: Iterable[String]): String = {
    val set = taken.toSet
    Iterator.from(0).map(i => if (i == 0) s"__$base" else s"__$base$i")
      .find(n => !set.contains(n)).get
  }
}
