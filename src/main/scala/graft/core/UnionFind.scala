package graft.core

/** Single-threaded union-find with path compression — the exact oracle the
  * distributed connected-components fixpoint (graft.operators
  * .ConnectedComponents) is tested against (SURVEY.md §2.f, §5.2.1).
  * Component label = minimum node id in the component.
  */
final class UnionFind {
  private val parent = collection.mutable.Map.empty[Long, Long]

  def find(x: Long): Long = {
    var r = x
    while (parent.getOrElse(r, r) != r) r = parent(r)
    // path compression
    var c = x
    while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
    r
  }

  def union(a: Long, b: Long): Unit = {
    val ra = find(a)
    val rb = find(b)
    if (ra != rb) {
      // min-label union so the root IS the component label
      if (ra < rb) parent(rb) = ra else parent(ra) = rb
    }
    // make sure isolated mentions are known
    parent.getOrElseUpdate(ra min rb, ra min rb)
  }

  def add(x: Long): Unit = { parent.getOrElseUpdate(x, x); () }

  /** (node, minLabelOfComponent) for every node ever seen. */
  def components(): Map[Long, Long] =
    parent.keys.map(k => k -> find(k)).toMap
}

object UnionFind {
  /** Connected components of an edge list; includes both endpoints. */
  def componentsOf(edges: Iterable[(Long, Long)]): Map[Long, Long] = {
    val uf = new UnionFind
    edges.foreach { case (a, b) => uf.add(a); uf.add(b); uf.union(a, b) }
    uf.components()
  }
}
