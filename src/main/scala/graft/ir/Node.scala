package graft.ir

/** The serializable IR: pipelines are data, exactly like the reference's
  * compiled EDN form (`/root/reference/src/clojure/mirabelle/stream.clj:23-57`
  * consumes nodes of shape `{:action kw, :params […], :children […]}`).
  *
  * JSON is the wire format here (EDN is Clojure-specific); the node shape
  * is preserved 1:1:
  *
  * {{{
  * {"action": "where", "params": [[">", "metric", 100]], "children": [
  *   {"action": "fixed-time-window", "params": [{"duration": 3600}],
  *    "children": [{"action": "tap", "params": ["out"]}]}]}
  * }}}
  *
  * Params decode to plain Scala values: strings, longs, doubles, booleans,
  * `Seq[Any]`, `Map[String, Any]` — the same vocabulary
  * [[graft.conditions.Condition.parse]] consumes.
  */
final case class Node(action: String, params: Seq[Any], children: Seq[Node])

object Node {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  def apply(action: String, params: Any*): Node = Node(action, params.toSeq, Nil)

  /** Parse one IR node from JSON. */
  def fromJson(json: String): Node = fromJValue(JsonMethods.parse(json))

  /** Serialize a node back to JSON — the inverse of [[fromJson]] over the
    * param vocabulary (strings, longs, doubles, booleans, null, seqs,
    * string-keyed maps), so pipelines persist as the same documents they
    * load from.
    */
  def toJson(node: Node): String = {
    def jAny(v: Any): JValue = v match {
      case null          => JNull
      case s: String     => JString(s)
      case b: Boolean    => JBool(b)
      case i: Int        => JLong(i.toLong)
      case l: Long       => JLong(l)
      case d: Double     => JDouble(d)
      case f: Float      => JDouble(f.toDouble)
      case n: BigInt     => JLong(n.toLong)
      case xs: Seq[_]    => JArray(xs.map(jAny).toList)
      case m: Map[_, _]  => JObject(m.toList.map { case (k, x) => k.toString -> jAny(x) })
      // masked config values serialize as their MASK: get-stream responses
      // and saveTo persistence never leak the secret (and never crash a
      // whole saveTo pass); the lossiness is the masking contract — the
      // secret's source of truth is the original EDN file
      case s: Edn.Secret => JString(s.toString)
      case other => throw new IllegalArgumentException(
        s"unserializable param ${other.getClass.getName}")
    }
    def jNode(n: Node): JObject = JObject(
      List("action" -> JString(n.action)) ++
        (if (n.params.nonEmpty) List("params" -> JArray(n.params.map(jAny).toList)) else Nil) ++
        (if (n.children.nonEmpty) List("children" -> JArray(n.children.map(jNode).toList)) else Nil))
    JsonMethods.compact(JsonMethods.render(jNode(node)))
  }

  /** Parse a JSON document containing several top-level nodes
    * (`{"streams": [...]}` or a bare array).
    */
  def manyFromJson(json: String): Seq[Node] = JsonMethods.parse(json) match {
    case JArray(xs) => xs.map(fromJValue)
    case o: JObject =>
      o \ "streams" match {
        case JArray(xs) => xs.map(fromJValue)
        case _          => Seq(fromJValue(o))
      }
    case other => throw new IllegalArgumentException(s"not an IR document: $other")
  }

  private[graft] def anyOf(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     => i.toLong
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JBool(b)    => b
    case JNull | JNothing => null
    case JArray(xs)  => xs.map(anyOf)
    case JSet(xs)    => xs.toSeq.map(anyOf)
    // ListMap: JSON object params keep DOCUMENT order through the IR, so
    // order-sensitive actions (rename-keys applies its pairs one by one,
    // like the reference) see the pairs the way the user wrote them
    case JObject(fs) =>
      scala.collection.immutable.ListMap(fs.map { case (k, x) => k -> anyOf(x) }: _*)
  }

  /** Config-layer `include` (reference `action.clj:2249-2277`): an
    * `{"action":"include","params":[path, {options}]}` node loads another
    * IR JSON file and splices it in place, after substituting template
    * markers — the JSON analog of the reference's aero templating:
    *
    *  - `{"var": "name"}` anywhere in params → `options.variables("name")`
    *    (reference `#mirabelle/var`);
    *  - `{"profile": {"dev": x, "prod": y, "default": z}}` in params →
    *    the value for the active profile (explicit `options.profile`, else
    *    the `PROFILE` environment variable, mirroring `get-env-profile`),
    *    falling back to `"default"`.
    *
    * The include node's own children are grafted onto every leaf of the
    * included tree, so a shared snippet composes downstream like any
    * ordinary action ("use the same configuration snippet from multiple
    * parts of the same stream").
    */
  def expandIncludes(node: Node,
      load: String => String = p => new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8),
      env: Map[String, String] = sys.env): Node =
    expandIncludes(node, load, env, Vector.empty)

  /** `seen` is the chain of include paths currently being expanded: a path
    * recurring in its own chain is a cycle (direct or mutual) and fails
    * with a clean error naming the loop instead of a StackOverflowError —
    * `Engine.validate` surfaces it as a per-node config error.
    */
  private def expandIncludes(node: Node, load: String => String,
      env: Map[String, String], seen: Vector[String]): Node = node match {
    case Node("include", params, children) =>
      val path = params.headOption match {
        case Some(s: String) => s
        case other => throw new IllegalArgumentException(s"include needs a path, got $other")
      }
      val norm = java.nio.file.Paths.get(path).normalize().toString
      if (seen.contains(norm))
        throw new IllegalArgumentException(
          s"include cycle: ${(seen :+ norm).mkString(" -> ")}")
      val opts = params.lift(1) match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        case _                  => Map.empty[String, Any]
      }
      val profile = opts.get("profile").map(_.toString).orElse(env.get("PROFILE"))
      val vars = opts.get("variables") match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        case _                  => Map.empty[String, Any]
      }
      def subst(v: Any): Any = v match {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          (mm.get("var"), mm.get("profile")) match {
            case (Some(name: String), _) if mm.size == 1 =>
              vars.getOrElse(name,
                throw new IllegalArgumentException(s"include: undefined variable '$name'"))
            case (_, Some(choices: Map[_, _])) if mm.size == 1 =>
              val cs = choices.asInstanceOf[Map[String, Any]]
              profile.flatMap(cs.get).orElse(cs.get("default")).getOrElse(
                throw new IllegalArgumentException(
                  s"include: no value for profile ${profile.getOrElse("<unset>")} and no default"))
            case _ => mm.map { case (k, x) => k -> subst(x) }
          }
        case xs: Seq[_] => xs.map(subst)
        case other      => other
      }
      def walk(n: Node): Node =
        Node(n.action, n.params.map(subst), n.children.map(walk))
      def graft(n: Node): Node =
        // the grafted children come from the INCLUDING document, so they
        // expand under the current chain, not the included file's
        if (n.children.isEmpty) n.copy(children = children.map(expandIncludes(_, load, env, seen)))
        else n.copy(children = n.children.map(graft))
      // a .edn include is a reference-style snippet (an action node in
      // EDN); anything else is the IR's own JSON
      val doc = if (norm.endsWith(".edn")) Edn.nodeOf(Edn.parse(load(path)))
                else fromJson(load(path))
      val included = walk(expandIncludes(doc, load, env, seen :+ norm))
      if (children.isEmpty) included else graft(included)
    case Node(a, p, cs) => Node(a, p, cs.map(expandIncludes(_, load, env, seen)))
  }

  def fromJValue(v: JValue): Node = v match {
    case o: JObject =>
      val action = o \ "action" match {
        case JString(s) => s
        case other      => throw new IllegalArgumentException(s"node missing action: $other")
      }
      val params = o \ "params" match {
        case JArray(xs) => xs.map(anyOf)
        case JNothing   => Nil
        case single     => Seq(anyOf(single))
      }
      val children = o \ "children" match {
        case JArray(xs) => xs.map(fromJValue)
        case JNothing   => Nil
        case other      => throw new IllegalArgumentException(s"children must be an array: $other")
      }
      Node(action, params, children)
    case other => throw new IllegalArgumentException(s"node must be an object: $other")
  }
}
