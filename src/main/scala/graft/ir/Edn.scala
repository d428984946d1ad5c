package graft.ir

import scala.collection.immutable.ListMap

/** EDN reader for reference-user config migration: the reference's stream
  * files are EDN maps of shape
  * `{:name {:actions {:action :kw :params [...] :children [...]}
  *          :default true}}` read by `read-edn-dirs`
  * (`src/clojure/mirabelle/stream.clj:154-166`, which aero-reads every
  * file in the configured directories and merges the maps).
  *
  * This is a dependency-free reader for the EDN subset those files use,
  * mapped onto the engine's existing param vocabulary (the same one
  * [[Node.fromJson]] produces), so an EDN stream file and its JSON twin
  * build identical [[Node]] trees:
  *
  *  - keywords and symbols → strings without the colon (`:above-dt` →
  *    `"above-dt"`, `:metric` → `"metric"` — conditions like
  *    `[:> :metric 100]` arrive exactly as the JSON `[">", "metric", 100]`);
  *  - maps → string-keyed `ListMap` in document order (the same
  *    order-preservation contract as JSON object params);
  *  - vectors/lists/sets → `Seq[Any]`;
  *  - integers → `Long`, floating point / ratios → `Double`;
  *  - `true`/`false`/`nil`, strings (with escapes), character literals;
  *  - `#_` discard and `;` comments;
  *  - aero-style tagged literals map onto [[Node.expandIncludes]]'
  *    substitution markers: `#mirabelle/var name` → `{"var": "name"}` and
  *    `#profile {...}` → `{"profile": {...}}` (any other tag becomes a
  *    single-entry map keyed by the tag name). Standalone loads resolve
  *    `#profile` immediately against the `PROFILE` environment variable
  *    (falling back to `:default`), mirroring `aero/read-config` with
  *    empty options; `#mirabelle/var` resolves at include-expansion time,
  *    where the including document supplies the variables.
  */
object Edn {

  /** The reference's aero `#secret` tag (`config.clj:45-47`, which wraps
    * the value in a mask): the value never appears in `toString` — so
    * logged configs, error messages, and persisted documents stay
    * redacted — and is recovered explicitly via [[Secret.reveal]].
    * Equality is by the underlying value so config diffing (hot reload)
    * still detects changed secrets without printing them.
    */
  final class Secret(private val value: Any) {
    def reveal: Any = value
    override def toString: String = "#secret[REDACTED]"
    override def equals(o: Any): Boolean = o match {
      case s: Secret => s.value == value
      case _         => false
    }
    override def hashCode: Int = 31 * value.##
  }
  object Secret {
    def apply(value: Any): Secret = new Secret(value)
  }

  /** Parse a single EDN form. */
  def parse(text: String): Any = {
    val p = new Parser(text)
    val v = p.nextForm()
    p.skipWs()
    require(p.eof, s"trailing content at offset ${p.pos}: ${p.rest.take(30)}")
    v
  }

  /** Parse every top-level form in the text. */
  def parseAll(text: String): Seq[Any] = {
    val p = new Parser(text)
    val out = scala.collection.mutable.ListBuffer[Any]()
    p.skipWs()
    while (!p.eof) { out += p.nextForm(); p.skipWs() }
    out.toSeq
  }

  /** Read an EDN stream file into `"stream"` nodes consumable by
    * [[StreamRegistry.addStreamNode]] — one per top-level map entry, in
    * document order. `#profile` markers are resolved against `env`
    * (aero's behavior when no explicit profile is passed: the `PROFILE`
    * variable, else the `:default` branch).
    */
  def streamDocs(text: String, env: Map[String, String] = sys.env): Seq[Node] =
    parse(text) match {
      case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]].toSeq.map { case (name, cfg) =>
          val c = cfg match {
            case cm: Map[_, _] => cm.asInstanceOf[Map[String, Any]]
            case other => throw new IllegalArgumentException(
              s"stream '$name': expected a config map, got $other")
          }
          val actions = c.getOrElse("actions",
            throw new IllegalArgumentException(s"stream '$name': missing :actions"))
          Node("stream",
            Seq(ListMap("name" -> name, "default" -> c.getOrElse("default", false))),
            Seq(nodeOf(resolveProfiles(actions, env))))
        }
      case other => throw new IllegalArgumentException(
        s"not an EDN stream document (expected a top-level map): $other")
    }

  /** Build a [[Node]] from a parsed `{:action .. :params .. :children ..}`
    * map — the EDN twin of [[Node.fromJValue]].
    */
  def nodeOf(v: Any): Node = v match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      val action = mm.get("action") match {
        case Some(s: String) => s
        case other => throw new IllegalArgumentException(s"node missing action: $other")
      }
      val params = mm.get("params") match {
        case Some(xs: Seq[_]) => xs.asInstanceOf[Seq[Any]]
        case Some(null) | None => Nil
        case Some(single)     => Seq(single)
      }
      val children = mm.get("children") match {
        case Some(xs: Seq[_]) => xs.map(nodeOf)
        case Some(null) | None => Nil
        case Some(other) => throw new IllegalArgumentException(s"children must be a vector: $other")
      }
      Node(action, params, children)
    case other => throw new IllegalArgumentException(s"node must be a map: $other")
  }

  /** Resolve `{"profile": {...}}` markers in place (everything else is
    * left for include-time substitution).
    */
  private def resolveProfiles(v: Any, env: Map[String, String]): Any = v match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      mm.get("profile") match {
        case Some(choices: Map[_, _]) if mm.size == 1 =>
          val cs = choices.asInstanceOf[Map[String, Any]]
          val chosen = env.get("PROFILE").flatMap(cs.get).orElse(cs.get("default")).getOrElse(
            throw new IllegalArgumentException(
              s"#profile: no value for ${env.getOrElse("PROFILE", "<unset>")} and no default"))
          // the selected branch may itself contain #profile markers
          resolveProfiles(chosen, env)
        case _ => mm.map { case (k, x) => k -> resolveProfiles(x, env) }
      }
    case xs: Seq[_]  => xs.map(resolveProfiles(_, env))
    case sec: Secret => Secret(resolveProfiles(sec.reveal, env)) // #secret #profile {...}
    case other       => other
  }

  // ---------------------------------------------------------------- parser

  private val SymbolChars: Set[Char] =
    Set('.', '*', '+', '!', '-', '_', '?', '$', '%', '&', '=', '<', '>', '/', '\'', '#')

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def rest: String = s.substring(math.min(pos, s.length))
    private def cur: Char = s.charAt(pos)
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"EDN parse error at offset $pos: $msg")

    def skipWs(): Unit = {
      var go = true
      while (go && !eof) {
        val c = cur
        if (c == ';') { while (!eof && cur != '\n') pos += 1 }
        else if (c.isWhitespace || c == ',') pos += 1
        else if (c == '#' && pos + 1 < s.length && s.charAt(pos + 1) == '_') {
          pos += 2; nextForm(); ()   // discard form
        } else go = false
      }
    }

    def nextForm(): Any = {
      skipWs()
      if (eof) fail("unexpected end of input")
      cur match {
        case '{' => pos += 1; readMap()
        case '[' => pos += 1; readSeq(']')
        case '(' => pos += 1; readSeq(')')
        case '"' => pos += 1; readString()
        case ':' => pos += 1; readName("keyword")
        case '\\' => pos += 1; readChar()
        case '#' => readDispatch()
        case c if c.isDigit || ((c == '-' || c == '+') && pos + 1 < s.length && s.charAt(pos + 1).isDigit) =>
          readNumber()
        case _ => readSymbol()
      }
    }

    private def readMap(): ListMap[String, Any] = {
      val buf = scala.collection.mutable.ListBuffer[(String, Any)]()
      skipWs()
      while (!eof && cur != '}') {
        val k = nextForm()
        val v = nextForm()
        buf += (keyString(k) -> v)
        skipWs()
      }
      if (eof) fail("unterminated map")
      pos += 1
      ListMap(buf.toSeq: _*)
    }

    private def keyString(k: Any): String = k match {
      case s0: String => s0
      case other      => String.valueOf(other)
    }

    private def readSeq(close: Char): Seq[Any] = {
      val buf = scala.collection.mutable.ListBuffer[Any]()
      skipWs()
      while (!eof && cur != close) { buf += nextForm(); skipWs() }
      if (eof) fail(s"unterminated sequence (expected '$close')")
      pos += 1
      buf.toSeq
    }

    private def readString(): String = {
      val sb = new StringBuilder
      while (!eof && cur != '"') {
        val c = cur
        if (c == '\\') {
          pos += 1
          if (eof) fail("unterminated string escape")
          cur match {
            case 'n'  => sb += '\n'
            case 't'  => sb += '\t'
            case 'r'  => sb += '\r'
            case 'b'  => sb += '\b'
            case 'f'  => sb += '\f'
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case 'u' =>
              if (pos + 4 >= s.length) fail("truncated \\u escape")
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other => fail(s"unknown string escape \\$other")
          }
          pos += 1
        } else { sb += c; pos += 1 }
      }
      if (eof) fail("unterminated string")
      pos += 1
      sb.toString
    }

    private def readChar(): String = {
      // named chars first, else a single literal char
      val named = Seq("newline" -> "\n", "space" -> " ", "tab" -> "\t",
        "return" -> "\r", "backspace" -> "\b", "formfeed" -> "\f")
      named.collectFirst {
        case (n, v) if s.regionMatches(pos, n, 0, n.length) &&
          (pos + n.length >= s.length || !isNameChar(s.charAt(pos + n.length))) =>
          pos += n.length; v
      }.getOrElse {
        if (eof) fail("unterminated character literal")
        val c = cur; pos += 1; c.toString
      }
    }

    private def isNameChar(c: Char): Boolean =
      c.isLetterOrDigit || SymbolChars.contains(c) || c == ':'

    private def readName(kind: String): String = {
      val start = pos
      while (!eof && isNameChar(cur)) pos += 1
      if (pos == start) fail(s"empty $kind")
      s.substring(start, pos)
    }

    private def readNumber(): Any = {
      val start = pos
      if (cur == '-' || cur == '+') pos += 1
      while (!eof && (cur.isDigit || cur == '.' || cur == 'e' || cur == 'E' ||
        cur == '/' || cur == 'M' || cur == 'N' ||
        ((cur == '-' || cur == '+') && "eE".contains(s.charAt(pos - 1))))) pos += 1
      val tok = s.substring(start, pos)
      if (tok.contains('/')) {               // ratio → double
        val Array(n, d) = tok.split('/')
        n.toDouble / d.toDouble
      } else if (tok.endsWith("N")) tok.dropRight(1).toLong
      else if (tok.endsWith("M")) tok.dropRight(1).toDouble
      else if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) tok.toDouble
      else tok.toLong
    }

    private def readSymbol(): Any = readName("symbol") match {
      case "true"  => true
      case "false" => false
      case "nil"   => null
      case sym     => sym
    }

    private def readDispatch(): Any = {
      pos += 1 // consume '#'
      if (eof) fail("unterminated dispatch")
      if (cur == '{') { pos += 1; readSeq('}') } // set → Seq, document order
      else {
        val tag = readName("tag")
        val value = nextForm()
        tag match {
          case "mirabelle/var" => ListMap("var" -> String.valueOf(value))
          case "profile"       => ListMap("profile" -> value)
          case "secret"        => Secret(value)
          case other           => ListMap(other -> value)
        }
      }
    }
  }
}
