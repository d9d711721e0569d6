package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** dbt macro-file loading — `macros/<file>.sql` Jinja macro definitions
  * (`/root/reference/macros/generate_database_name.sql:1-9`), parsed
  * into callable definitions and evaluated with a deliberately small
  * Jinja subset: exactly the constructs the reference macro (and the
  * common SQL-snippet macro) uses —
  *
  *  - `{% macro name(arg, arg=default) %} … {% endmacro %}`
  *  - `{%- set var = expr -%}`
  *  - `{%- if expr %} … [{%- elif -%} …] [{%- else -%} …] {%- endif -%}`
  *    with `x is [not] none` tests, `not`, and `==` / `!=` comparisons
  *    (blocks nest freely — templates parse into an AST)
  *  - `{% for x in list %} … {% endfor %}` with `loop.first` /
  *    `loop.last` / `loop.index` / `loop.index0` / `loop.length` — the
  *    dbt loop-generated-columns idiom
  *  - `{{ expr }}` where expr is `none`, `true`/`false`, a `'literal'`,
  *    an integer, a `['list', …]`, or a dotted name resolved against
  *    the call environment (`target.database`), with
  *    `| trim | upper | lower` filter chains
  *
  * Whitespace-control markers (`{%-`/`-%}`/`{{-`/`-}}`) strip adjacent
  * whitespace as in Jinja. Anything outside the subset fails loudly at
  * call time — a macro silently mis-rendered into SQL would be far
  * worse than an error naming the construct.
  *
  * Two consumers: [[Registry.databaseName]] resolves database routing
  * through the loaded `generate_database_name` (the reference's file is
  * the behavioral fixture — RegistrySpec loads it as-is and pins
  * equality), and [[SqlModels]] expands `{{ my_macro(...) }}` call
  * sites in model SQL against the same library, so a project's own
  * SQL-snippet macros work in SQL-authored models. All driver-side
  * string work at plan-construction time — nothing changes on the
  * cluster.
  */
object Macros {

  final case class MacroDef(
    name: String,
    params: Seq[(String, Option[String])],
    body: String)

  private val MacroRe =
    (raw"(?s)\{%-?\s*macro\s+(\w+)\s*\(([^)]*)\)\s*-?%\}" +
      raw"(.*?)\{%-?\s*endmacro\s*-?%\}").r

  /** dbt custom generic tests: a `test name(model, column_name, …)`
    * block is sugar dbt itself desugars to a macro named `test_name` —
    * parsed here the same way, so [[graft.quality.SchemaYaml]]'s
    * `data_tests:` entries resolve custom test names against this
    * library as `test_<name>`. The legacy spelling (a plain macro
    * already named `test_<name>`) needs no special handling. */
  private val TestRe =
    (raw"(?s)\{%-?\s*test\s+(\w+)\s*\(([^)]*)\)\s*-?%\}" +
      raw"(.*?)\{%-?\s*endtest\s*-?%\}").r

  private val TagRe = raw"(?s)\{%\s*(.*?)\s*%\}|\{\{\s*(.*?)\s*\}\}".r

  final class Library(val defs: Map[String, MacroDef]) {

    def contains(name: String): Boolean = defs.contains(name)

    /** Call a macro: positional args fill parameters left to right,
      * `named` kwargs bind by parameter name (dbt's common
      * `{{ m(col='x') }}` style), `ctx` supplies globals (e.g. `target`
      * → Map("database" → …)), parameter defaults fill the rest. */
    def call(name: String, positional: Seq[Any],
        ctx: Map[String, Any] = Map.empty,
        named: Map[String, Any] = Map.empty): String = {
      val d = defs.getOrElse(name,
        throw new IllegalArgumentException(s"unknown macro '$name'"))
      require(positional.size <= d.params.size,
        s"$name: ${positional.size} args for ${d.params.size} params")
      val paramNames = d.params.map(_._1).toSet
      named.keys.foreach(k => require(paramNames.contains(k),
        s"$name: unknown keyword argument '$k'"))
      val defaults = d.params.collect { case (p, Some(dv)) =>
        p -> evalExpr(dv, ctx) }.toMap
      val bound = d.params.map(_._1).zip(positional).toMap
      bound.keySet.intersect(named.keySet).foreach(k =>
        throw new IllegalArgumentException(
          s"$name: argument '$k' given both positionally and by keyword"))
      render(d.body, ctx ++ defaults ++ bound ++ named)
    }

    /** Expand `{{ name(args) }}` call sites of THIS library's macros in
      * SQL text — 'quoted' strings, integers, none, and `kw=value`
      * keyword args. Bare identifiers FAIL LOUDLY: expansion happens
      * before the Jinja render, so a loop/set variable is not bound yet
      * and splicing its NAME into SQL would silently mis-render (the
      * module's contract is an error naming the construct instead).
      * Non-library names (ref, source, dbt_utils.*) are left for the
      * caller's own substitutions. */
    def expandIn(sql: String, ctx: Map[String, Any] = Map.empty): String = {
      val CallRe = raw"\{\{\s*(\w+)\s*\(([^)]*)\)\s*\}\}".r
      CallRe.replaceAllIn(sql, m =>
        if (!defs.contains(m.group(1))) java.util.regex.Matcher.quoteReplacement(m.matched)
        else {
          val (pos, named) = parseArgs(m.group(1), m.group(2))
          java.util.regex.Matcher.quoteReplacement(
            call(m.group(1), pos, ctx, named))
        })
    }

    /** Split a call site's argument text on TOP-LEVEL commas (commas
      * inside quotes belong to the value) into positional and keyword
      * args. */
    private def parseArgs(macroName: String,
        raw: String): (Seq[Any], Map[String, Any]) = {
      val parts = Vector.newBuilder[String]
      val cur = new StringBuilder
      var quote: Char = 0
      raw.foreach { c =>
        if (quote != 0) { cur.append(c); if (c == quote) quote = 0 }
        else if (c == '\'' || c == '"') { cur.append(c); quote = c }
        else if (c == ',') { parts += cur.toString; cur.clear() }
        else cur.append(c)
      }
      parts += cur.toString
      val KwRe = raw"(?s)(\w+)\s*=\s*(.+)".r
      def value(macroNm: String, s: String): Any = s match {
        case v if v.startsWith("'") && v.endsWith("'") && v.length >= 2 =>
          v.substring(1, v.length - 1)
        case v if v.startsWith("\"") && v.endsWith("\"") && v.length >= 2 =>
          v.substring(1, v.length - 1)
        case "none" => null
        case "true" | "True" => true
        case "false" | "False" => false
        case IntLit() => s.toInt
        case bare => throw new IllegalArgumentException(
          s"$macroNm: macro call argument '$bare' is not a literal — " +
            "expansion runs before the Jinja render, so variables are " +
            "not bound here; pass 'quoted' strings, numbers, or none")
      }
      val trimmed = parts.result().map(_.trim).filter(_.nonEmpty)
      val (kw, pos) = trimmed.partition(KwRe.pattern.matcher(_).matches())
      pos.foreach(p => require(kw.isEmpty || trimmed.indexOf(p) < trimmed.indexOf(kw.head),
        s"$macroName: positional argument after keyword argument"))
      (pos.map(value(macroName, _)),
        kw.map { case KwRe(k, v) => k -> value(macroName, v.trim) }.toMap)
    }
  }

  // ---- template AST: tokenize → parse → eval ------------------------
  // (a linear emit-walk can't replay a {% for %} body, so templates
  // parse into nested nodes first; if/for nest freely)

  private sealed trait Node
  private final case class TextN(s: String) extends Node
  private final case class ExprN(e: String) extends Node
  private final case class SetN(name: String, expr: String) extends Node
  private final case class IfN(branches: Seq[(String, Vector[Node])],
    orElse: Vector[Node]) extends Node
  private final case class ForN(v: String, iter: String,
    body: Vector[Node]) extends Node

  private sealed trait Tok
  private final case class TextT(s: String) extends Tok
  private final case class TagT(s: String) extends Tok
  private final case class ExprT(s: String) extends Tok

  private def tokenize(body: String): Vector[Tok] = {
    // whitespace-control markers strip adjacent whitespace
    var t = body
    t = raw"\s*\{%-".r.replaceAllIn(t, "{%")
    t = raw"-%\}\s*".r.replaceAllIn(t, "%}")
    t = raw"\s*\{\{-".r.replaceAllIn(t, "{{")
    t = raw"-\}\}\s*".r.replaceAllIn(t, "}}")
    val out = Vector.newBuilder[Tok]
    var last = 0
    TagRe.findAllMatchIn(t).foreach { m =>
      if (m.start > last) out += TextT(t.substring(last, m.start))
      last = m.end
      (Option(m.group(1)), Option(m.group(2))) match {
        case (Some(tag), _) => out += TagT(tag)
        case (_, Some(e)) => out += ExprT(e)
        case _ => ()
      }
    }
    if (last < t.length) out += TextT(t.substring(last))
    out.result()
  }

  private val SetRe = raw"(?s)set\s+(\w+)\s*=\s*(.+)".r
  private val IfTagRe = raw"(?s)if\s+(.+)".r
  private val ElifRe = raw"(?s)elif\s+(.+)".r
  private val ForTagRe = raw"(?s)for\s+(\w+)\s+in\s+(.+)".r

  /** Parse tokens from `i` until one of `stops` (or EOF when `stops` is
    * empty); returns (nodes, index past the stop tag, the stop tag). */
  private def parseNodes(toks: Vector[Tok], i0: Int,
      stops: Set[String]): (Vector[Node], Int, String) = {
    val nodes = Vector.newBuilder[Node]
    var i = i0
    while (i < toks.length) {
      toks(i) match {
        case TextT(s) => nodes += TextN(s); i += 1
        case ExprT(e) => nodes += ExprN(e); i += 1
        case TagT(tag) =>
          val head = tag.split(raw"\s+", 2).head
          if (stops.contains(head)) return (nodes.result(), i + 1, tag)
          tag match {
            case SetRe(n, e) => nodes += SetN(n, e); i += 1
            case ForTagRe(v, iter) =>
              val (body, ni, _) = parseNodes(toks, i + 1, Set("endfor"))
              nodes += ForN(v, iter, body); i = ni
            case IfTagRe(cond0) =>
              var branches = Vector.empty[(String, Vector[Node])]
              var orElse = Vector.empty[Node]
              var cond = cond0
              var j = i + 1
              var open = true
              while (open) {
                val (body, nj, stop) =
                  parseNodes(toks, j, Set("elif", "else", "endif"))
                branches = branches :+ ((cond, body)); j = nj
                stop match {
                  case ElifRe(c) => cond = c
                  case "else" =>
                    val (eb, nk, _) = parseNodes(toks, j, Set("endif"))
                    orElse = eb; j = nk; open = false
                  case _ => open = false // endif
                }
              }
              nodes += IfN(branches, orElse); i = j
            case other => throw new IllegalArgumentException(
              s"unsupported Jinja tag '{% $other %}'")
          }
      }
    }
    require(stops.isEmpty, s"unclosed block — expected {% ${stops.mkString("/")} %}")
    (nodes.result(), i, "")
  }

  private def evalNodes(nodes: Vector[Node], env0: Map[String, Any],
      out: StringBuilder): Map[String, Any] = {
    var env = env0
    nodes.foreach {
      case TextN(s) => out.append(s)
      case SetN(n, e) => env += n -> evalExpr(e, env)
      case ExprN(expr) =>
        // call-shaped expressions (ref('m'), source('s','t'),
        // dbt_utils.*) are NOT evaluated here — they re-emit
        // verbatim for the caller's own render-time substitutions,
        // exactly like dbt's env-provided callables
        if (raw"(?s)[\w.]+\(.*\)".r.pattern.matcher(expr).matches())
          out.append(s"{{ $expr }}")
        else {
          val v = evalExpr(expr, env)
          require(v != null, s"'{{ $expr }}' rendered null")
          out.append(String.valueOf(v))
        }
      case IfN(branches, orElse) =>
        branches.find(b => truthy(evalExpr(b._1, env))) match {
          case Some((_, body)) => env = evalNodes(body, env, out)
          case None => env = evalNodes(orElse, env, out)
        }
      case ForN(v, iterExpr, body) =>
        val items = evalExpr(iterExpr, env) match {
          case s: Seq[_] => s
          case other => throw new IllegalArgumentException(
            s"'{% for $v in $iterExpr %}': not a list (${String.valueOf(other)})")
        }
        val n = items.size
        items.zipWithIndex.foreach { case (item, idx) =>
          val loopEnv = env + (v -> item) + ("loop" -> Map(
            "first" -> (idx == 0), "last" -> (idx == n - 1),
            "index" -> (idx + 1), "index0" -> idx, "length" -> n))
          evalNodes(body, loopEnv, out) // loop-local sets don't escape
        }
    }
    env
  }

  /** Render template text against an environment — the small-subset
    * Jinja engine shared by macro bodies and SQL-model bodies. */
  private[pipeline] def render(body: String, env0: Map[String, Any]): String = {
    val (nodes, _, _) = parseNodes(tokenize(body), 0, Set.empty)
    val out = new StringBuilder
    evalNodes(nodes, env0, out)
    out.toString
  }

  private def truthy(v: Any): Boolean = v match {
    case b: Boolean => b
    case null => false
    case s: String => s.nonEmpty
    // Jinja truthiness: 0 and empty containers are falsy — the standard
    // `{% if loop.index0 %}, {% endif %}` separator idiom depends on it
    case i: Int => i != 0
    case s: Seq[_] => s.nonEmpty
    case m: Map[_, _] => m.nonEmpty
    case _ => true
  }

  /** Evaluate the expression subset: `is [not] none` tests, `not`,
    * `==` / `!=` comparisons, `|` filter chains over a primary
    * (none / true / false / 'literal' / integer / ['list', …] /
    * dotted name). */
  private def evalExpr(expr: String, env: Map[String, Any]): Any = {
    val IsNone = raw"(?s)(.+?)\s+is\s+none".r
    val IsNotNone = raw"(?s)(.+?)\s+is\s+not\s+none".r
    val NotRe = raw"(?s)not\s+(.+)".r
    val EqRe = raw"(?s)(.+?)\s*==\s*(.+)".r
    val NeRe = raw"(?s)(.+?)\s*!=\s*(.+)".r
    expr.trim match {
      case IsNotNone(e) => evalExpr(e, env) != null
      case IsNone(e) => evalExpr(e, env) == null
      case NotRe(e) => !truthy(evalExpr(e, env))
      case EqRe(a, b) => evalExpr(a, env) == evalExpr(b, env)
      case NeRe(a, b) => evalExpr(a, env) != evalExpr(b, env)
      case e =>
        val parts = e.split(raw"\|").map(_.trim)
        parts.tail.foldLeft(evalPrimary(parts.head, env)) { (v, f) =>
          if (v == null) null
          else f match {
            case "trim" => String.valueOf(v).trim
            case "upper" => String.valueOf(v).toUpperCase(java.util.Locale.ROOT)
            case "lower" => String.valueOf(v).toLowerCase(java.util.Locale.ROOT)
            case other => throw new IllegalArgumentException(
              s"unsupported Jinja filter '$other'")
          }
        }
    }
  }

  private val IntLit = raw"-?\d+".r
  private val ListLit = raw"(?s)\[(.*)\]".r

  private def evalPrimary(p: String, env: Map[String, Any]): Any = p match {
    case "none" => null
    // dbt's incremental-phase predicate: bound as a boolean in the env
    // by the model renderer (SqlModels renders each phase once)
    case "is_incremental()" => env.getOrElse("is_incremental",
      throw new IllegalArgumentException(
        "is_incremental() outside a model render"))
    case "true" | "True" => true
    case "false" | "False" => false
    case IntLit() => p.toInt
    case s if s.startsWith("'") && s.endsWith("'") && s.length >= 2 =>
      s.substring(1, s.length - 1)
    case ListLit(inner) =>
      inner.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        .map(evalExpr(_, env))
    case dotted =>
      dotted.split(raw"\.").foldLeft[Any](env) {
        case (m: Map[_, _], seg) =>
          m.asInstanceOf[Map[String, Any]].getOrElse(seg,
            throw new IllegalArgumentException(s"unknown name '$dotted'"))
        case _ => throw new IllegalArgumentException(
          s"cannot dereference '$dotted'")
      }
  }

  private def paramsOf(raw: String): Seq[(String, Option[String])] =
    raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      .map { p =>
        p.split("=", 2).map(_.trim) match {
          case Array(n) => n -> None
          case Array(n, d) => n -> Some(d)
        }
      }

  def parse(text: String): Seq[MacroDef] =
    MacroRe.findAllMatchIn(text).map(m =>
      MacroDef(m.group(1), paramsOf(m.group(2)), m.group(3))).toSeq ++
    TestRe.findAllMatchIn(text).map(m =>
      MacroDef(s"test_${m.group(1)}", paramsOf(m.group(2)), m.group(3))).toSeq

  def load(files: Seq[File]): Library =
    new Library(files.flatMap(f => parse(
      new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)))
      .map(d => d.name -> d).toMap)

  /** Load every `.sql` file under a macros directory; an absent
    * directory yields an empty library (a project without macros). */
  def loadDir(root: File): Library =
    load(Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".sql"))
      .sortBy(_.getName).toSeq)

  /** Load several macro directories into one library (later dirs win on
    * a name collision, matching dbt's project-over-package shadowing
    * order for a single project). */
  def loadDirs(roots: Seq[File]): Library =
    new Library(roots.map(loadDir).foldLeft(Map.empty[String, MacroDef])(
      (acc, lib) => acc ++ lib.defs))

  /** The engine's default library: the checked-in `macros/` dir plus
    * dbt's generic-test home `tests/generic/` (same working-directory
    * contract as the models dir; override with -Dgraft.macros.root). */
  lazy val default: Library = loadDirs(Seq(
    new File(sys.props.getOrElse("graft.macros.root", "macros")),
    new File(sys.props.getOrElse("graft.generic.tests.root",
      "tests/generic"))))
}
