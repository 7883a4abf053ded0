package graft.core

/**
 * Dependency DAG over pipeline nodes (reference: odibi/graph.py:12-230 —
 * cycle check :108, topological_sort :221, execution layers).
 */
final case class DependencyGraph(edges: Map[String, Seq[String]]) {

  /** node -> its dependencies; all mentioned nodes are vertices. */
  private val vertices: Set[String] =
    edges.keySet ++ edges.values.flatten.toSet

  def dependentsOf(node: String): Seq[String] =
    edges.collect { case (n, deps) if deps.contains(node) => n }.toSeq

  /** Throws on cycles, naming the cycle path (graph.py:108). */
  def checkCycles(): Unit = {
    val visiting = scala.collection.mutable.Set.empty[String]
    val done = scala.collection.mutable.Set.empty[String]
    def visit(n: String, path: List[String]): Unit = {
      if (visiting.contains(n))
        throw new IllegalStateException(
          s"dependency cycle: ${(n :: path.takeWhile(_ != n) ::: List(n)).reverse.mkString(" -> ")}")
      if (!done.contains(n)) {
        visiting += n
        edges.getOrElse(n, Nil).foreach(d => visit(d, n :: path))
        visiting -= n
        done += n
      }
    }
    vertices.foreach(v => visit(v, Nil))
  }

  /** Kahn topological order, deterministic (name-sorted ties). */
  def topologicalSort(): Seq[String] = {
    checkCycles()
    val inDeg = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    vertices.foreach(v => inDeg(v) = edges.getOrElse(v, Nil).size)
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    var ready = vertices.filter(inDeg(_) == 0).toSeq.sorted
    val emitted = scala.collection.mutable.Set.empty[String]
    while (ready.nonEmpty) {
      val n = ready.head
      ready = ready.tail
      order += n; emitted += n
      val unlocked = dependentsOf(n).filter { d =>
        !emitted.contains(d) && edges.getOrElse(d, Nil).forall(emitted.contains)
      }
      ready = (ready ++ unlocked).distinct.sorted
    }
    order.toSeq
  }

  /** Parallelizable layers: all nodes whose deps are satisfied run together. */
  def executionLayers(): Seq[Seq[String]] = {
    checkCycles()
    val remaining = scala.collection.mutable.Set.empty[String] ++ vertices
    val doneSet = scala.collection.mutable.Set.empty[String]
    val layers = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    while (remaining.nonEmpty) {
      val layer = remaining.filter(n => edges.getOrElse(n, Nil).forall(doneSet.contains))
        .toSeq.sorted
      if (layer.isEmpty)
        throw new IllegalStateException(s"unresolvable nodes: $remaining")
      layers += layer
      remaining --= layer
      doneSet ++= layer
    }
    layers.toSeq
  }

  /** Prune `disabled` plus everything transitively downstream of them. */
  def pruneDisabled(disabled: Set[String]): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String] ++ disabled
    var changed = true
    while (changed) {
      changed = false
      vertices.foreach { v =>
        if (!out.contains(v) && edges.getOrElse(v, Nil).exists(out.contains)) {
          out += v; changed = true
        }
      }
    }
    out.toSet
  }

  /** Selected nodes plus all transitive upstream dependencies. */
  def withUpstream(selected: Set[String]): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    def add(n: String): Unit = if (!out.contains(n)) {
      out += n
      edges.getOrElse(n, Nil).foreach(add)
    }
    selected.foreach(add)
    out.toSet
  }
}
