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

  private[ir] def anyOf(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     => i.toLong
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JBool(b)    => b
    case JNull | JNothing => null
    case JArray(xs)  => xs.map(anyOf)
    case JSet(xs)    => xs.toSeq.map(anyOf)
    case JObject(fs) => fs.map { case (k, x) => k -> anyOf(x) }.toMap
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
