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
    streams.foreach { case (name, node, default) =>
      if (default) sb.append(s"""default -> "$name entrypoint";\n""")
      sb.append(s"""subgraph cluster_${sanitize(name)} {\nlabel =<<B>Stream ${escape(name)}</B>>;\nlabeljust="l";\n""")
      walk(name, node, s""""$name entrypoint"""", s"${sanitize(name)}_0", sb, cross)
      sb.append("}\n")
    }
    sb.append(cross)
    sb.append("}\n")
    sb.toString
  }

  private def walk(stream: String, n: Node, parent: String, id: String,
                   sb: StringBuilder, cross: StringBuilder): Unit = {
    val params = if (n.params.isEmpty) ""
      else "<BR/>" + escape(n.params.map(String.valueOf).mkString(" "))
    sb.append(s"$id [label=<<B>${escape(n.action)}</B>$params>];\n")
    sb.append(s"$parent -> $id;\n")
    if (n.action == "reinject!") {
      val target = n.params.headOption.map(String.valueOf).getOrElse(stream)
      cross.append(s"""$id -> "$target entrypoint" [style=dashed];\n""")
    }
    n.children.zipWithIndex.foreach { case (c, i) =>
      walk(stream, c, id, s"${id}_$i", sb, cross)
    }
  }

  private def sanitize(s: String): String = s.map(c => if (c.isLetterOrDigit) c else '_')

  private def escape(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;")
    .replace(">", "&gt;").replace("\"", "&quot;")
}
