package graft.ir

/** Stream-pipeline DAG export to Graphviz DOT — the analog of the
  * reference's `graphviz` CLI command (`graphviz.clj:48-72`,
  * `core.clj:106-123`: read the streams directory, render each stream as
  * a labeled cluster, draw `default -> <stream> entrypoint` edges for
  * default-flagged streams and dashed cross-stream edges for
  * `reinject!`).
  *
  * Deterministic output (node ids are positional, not UUIDs) so the DOT
  * text is diffable and testable; masked `#secret` params print via
  * their mask — the export never leaks a secret.
  */
object Graphviz {

  /** Render a whole registry (insertion order). */
  def dot(registry: StreamRegistry): String =
    dot(registry.list.map(n => (n, registry.get(n).get, registry.defaults.contains(n))))

  /** Render `(name, pipeline, default?)` stream entries as one digraph. */
  def dot(streams: Seq[(String, Node, Boolean)]): String = {
    val sb = new StringBuilder("digraph {\nnode[shape=box];\n")
    val cross = new StringBuilder
    streams.zipWithIndex.foreach { case ((name, node, default), idx) =>
      if (default) sb.append(s"default -> ${entry(name)};\n")
      // the positional index keeps cluster/node ids unique even when two
      // stream names sanitize to the same identifier ("a-b" vs "a.b")
      sb.append(s"""subgraph cluster_${idx}_${sanitize(name)} {\nlabel =<<B>Stream ${escape(name)}</B>>;\nlabeljust="l";\n""")
      walk(node, entry(name), s"s${idx}_0", sb, cross)
      sb.append("}\n")
    }
    sb.append(cross)
    sb.append("}\n")
    sb.toString
  }

  /** Quoted entrypoint node id for a stream name (quote-escaped). */
  private def entry(stream: String): String =
    "\"" + stream.replace("\\", "\\\\").replace("\"", "\\\"") + " entrypoint\""

  private def walk(n: Node, parent: String, id: String,
                   sb: StringBuilder, cross: StringBuilder): Unit = {
    val params = if (n.params.isEmpty) ""
      else "<BR/>" + escape(n.params.map(String.valueOf).mkString(" "))
    sb.append(s"$id [label=<<B>${escape(n.action)}</B>$params>];\n")
    sb.append(s"$parent -> $id;\n")
    if (n.action == "reinject!") {
      // mirror the ENGINE's routing: named param (":"-normalized like
      // pStr) targets that stream's entrypoint; no param fans out through
      // every default-flagged stream (Engine.interp's reinject! case), so
      // the edge points at the shared `default` node those streams hang
      // off — not at a dangling '"default" entrypoint' nobody declared
      n.params.headOption.map(String.valueOf(_).stripPrefix(":")) match {
        case Some(t) => cross.append(s"$id -> ${entry(t)} [style=dashed];\n")
        case None    => cross.append(s"$id -> default [style=dashed];\n")
      }
    }
    n.children.zipWithIndex.foreach { case (c, i) =>
      walk(c, id, s"${id}_$i", sb, cross)
    }
  }

  private def sanitize(s: String): String = s.map(c => if (c.isLetterOrDigit) c else '_')

  private def escape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;")
    .replace(">", "&gt;").replace("\"", "&quot;")
}
