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
  *  - `{%- if expr %} … [{%- else -%} …] {%- endif -%}` with
  *    `x is none` / `x is not none` tests (nesting supported via the
  *    render stack)
  *  - `{{ expr }}` where expr is `none`, a `'literal'`, a dotted name
  *    resolved against the call environment (`target.database`), with
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

  private val TagRe = raw"(?s)\{%\s*(.*?)\s*%\}|\{\{\s*(.*?)\s*\}\}".r

  final class Library(val defs: Map[String, MacroDef]) {

    def contains(name: String): Boolean = defs.contains(name)

    /** Call a macro: positional args fill parameters left to right,
      * `ctx` supplies globals (e.g. `target` → Map("database" → …)),
      * parameter defaults fill the rest. */
    def call(name: String, positional: Seq[Any],
        ctx: Map[String, Any] = Map.empty): String = {
      val d = defs.getOrElse(name,
        throw new IllegalArgumentException(s"unknown macro '$name'"))
      require(positional.size <= d.params.size,
        s"$name: ${positional.size} args for ${d.params.size} params")
      val defaults = d.params.collect { case (p, Some(dv)) =>
        p -> evalExpr(dv, ctx) }.toMap
      val bound = d.params.map(_._1).zip(positional).toMap
      render(d.body, ctx ++ defaults ++ bound)
    }

    /** Expand `{{ name(args) }}` call sites of THIS library's macros in
      * SQL text ('quoted' args become string values, bare tokens pass
      * through as raw text — both arrive as strings, which is what a
      * SQL-snippet macro splices). Non-library names (ref, source,
      * dbt_utils.*) are left for the caller's own substitutions. */
    def expandIn(sql: String, ctx: Map[String, Any] = Map.empty): String = {
      val CallRe = raw"\{\{\s*(\w+)\s*\(([^)]*)\)\s*\}\}".r
      CallRe.replaceAllIn(sql, m =>
        if (!defs.contains(m.group(1))) java.util.regex.Matcher.quoteReplacement(m.matched)
        else java.util.regex.Matcher.quoteReplacement(
          call(m.group(1), parseArgs(m.group(2)), ctx)))
    }

    private def parseArgs(raw: String): Seq[Any] =
      raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map {
        case s if s.startsWith("'") && s.endsWith("'") && s.length >= 2 =>
          s.substring(1, s.length - 1)
        case "none" => null
        case bare => bare
      }
  }

  /** Render a macro body against an environment — the small-subset
    * Jinja walk: text segments emit (when the if-stack allows), tags
    * mutate the environment or the stack. */
  private def render(body: String, env0: Map[String, Any]): String = {
    // whitespace-control markers strip adjacent whitespace
    var t = body
    t = raw"\s*\{%-".r.replaceAllIn(t, "{%")
    t = raw"-%\}\s*".r.replaceAllIn(t, "%}")
    t = raw"\s*\{\{-".r.replaceAllIn(t, "{{")
    t = raw"-\}\}\s*".r.replaceAllIn(t, "}}")
    val out = new StringBuilder
    var env = env0
    var stack = List.empty[Boolean] // if-branch activity, innermost first
    def emitting = stack.forall(identity)
    var last = 0
    val SetRe = raw"(?s)set\s+(\w+)\s*=\s*(.+)".r
    val IfRe = raw"(?s)if\s+(.+)".r
    TagRe.findAllMatchIn(t).foreach { m =>
      if (emitting) out.append(t.substring(last, m.start))
      last = m.end
      (Option(m.group(1)), Option(m.group(2))) match {
        case (Some(tag), _) => tag match {
          case SetRe(name, expr) =>
            if (emitting) env += name -> evalExpr(expr, env)
          case IfRe(cond) =>
            stack = (emitting && truthy(evalExpr(cond, env))) :: stack
          case "else" =>
            require(stack.nonEmpty, "else without if")
            stack = (stack.tail.forall(identity) && !stack.head) :: stack.tail
          case "endif" =>
            require(stack.nonEmpty, "endif without if")
            stack = stack.tail
          case other => throw new IllegalArgumentException(
            s"unsupported Jinja tag '{% $other %}'")
        }
        case (_, Some(expr)) =>
          if (emitting) {
            // call-shaped expressions (ref('m'), source('s','t'),
            // dbt_utils.*) are NOT evaluated here — they re-emit
            // verbatim for the caller's own render-time substitutions,
            // exactly like dbt's env-provided callables
            if (raw"[\w.]+\(.*\)".r.pattern.matcher(expr).matches())
              out.append(s"{{ $expr }}")
            else {
              val v = evalExpr(expr, env)
              require(v != null, s"'{{ $expr }}' rendered null")
              out.append(String.valueOf(v))
            }
          }
        case _ => ()
      }
    }
    require(stack.isEmpty, "unclosed {% if %}")
    out.append(t.substring(last))
    out.toString
  }

  private def truthy(v: Any): Boolean = v match {
    case b: Boolean => b
    case null => false
    case s: String => s.nonEmpty
    case _ => true
  }

  /** Evaluate the expression subset: `is [not] none` tests, `|` filter
    * chains over a primary (none / 'literal' / dotted name). */
  private def evalExpr(expr: String, env: Map[String, Any]): Any = {
    val IsNone = raw"(?s)(.+?)\s+is\s+none".r
    val IsNotNone = raw"(?s)(.+?)\s+is\s+not\s+none".r
    expr.trim match {
      case IsNotNone(e) => evalExpr(e, env) != null
      case IsNone(e) => evalExpr(e, env) == null
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

  private def evalPrimary(p: String, env: Map[String, Any]): Any = p match {
    case "none" => null
    case s if s.startsWith("'") && s.endsWith("'") && s.length >= 2 =>
      s.substring(1, s.length - 1)
    case dotted =>
      dotted.split(raw"\.").foldLeft[Any](env) {
        case (m: Map[_, _], seg) =>
          m.asInstanceOf[Map[String, Any]].getOrElse(seg,
            throw new IllegalArgumentException(s"unknown name '$dotted'"))
        case _ => throw new IllegalArgumentException(
          s"cannot dereference '$dotted'")
      }
  }

  def parse(text: String): Seq[MacroDef] =
    MacroRe.findAllMatchIn(text).map { m =>
      val params = m.group(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        .map { p =>
          p.split("=", 2).map(_.trim) match {
            case Array(n) => n -> None
            case Array(n, d) => n -> Some(d)
          }
        }
      MacroDef(m.group(1), params, m.group(3))
    }.toSeq

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

  /** The engine's default library: the checked-in `macros/` dir (same
    * working-directory contract as the models dir; override with
    * -Dgraft.macros.root). */
  lazy val default: Library = loadDir(new File(
    sys.props.getOrElse("graft.macros.root", "macros")))
}
