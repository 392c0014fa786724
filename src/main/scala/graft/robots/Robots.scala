package graft.robots

import java.net.URLDecoder

/**
 * robots.txt grammar + matching, semantics-equal to the reference parser
 * (reference: src/main/scala/es/udc/scrawl/pipeline/RobotsParser.scala:6-158,
 * behavior locked by RobotsParserTest.scala:7-124):
 *
 *  - `User-agent` groups may list several UAs; a group with `*` becomes the
 *    default entry and only the FIRST `*` group ever wins (RobotsParser.scala:23-26);
 *  - a specific-UA entry beats the default; the first matching specific entry
 *    is consulted EXCLUSIVELY (RobotsParser.scala:97-101);
 *  - `#` starts a comment; values are URL-decoded; UA matched on the token
 *    before `/`, lowercased (RobotsParser.scala:96);
 *  - rule forms from the first `*` split (RobotsParser.scala:68-79):
 *    `path` exact-or-directory-prefix, `*` deny-all, `*suffix` suffix,
 *    `prefix*` prefix, `a*b` prefix+suffix; empty Disallow = allow-all;
 *  - unknown UA with no default entry ⇒ allowed (RobotsParser.scala:105).
 *
 * Rules are plain case classes so a parsed robots file serializes cleanly
 * into a Spark row (JSON-ish string column on the robots state table) and
 * back — no closures cross the executor boundary.
 */
sealed trait RobotRule {
  def allowed(path: String): Boolean
  def encode: String
}
final case class ExactRule(path: String) extends RobotRule {
  // reference BasicRule (RobotsParser.scala:138-142): empty = allow-all;
  // deny on exact match or directory prefix when the rule ends with "/"
  def allowed(p: String): Boolean =
    path.isEmpty || !(path == p || (path.endsWith("/") && p.startsWith(path)))
  def encode: String = "E" + path
}
final case object DenyAllRule extends RobotRule {
  def allowed(p: String): Boolean = false
  def encode: String = "A"
}
final case class PrefixRule(prefix: String) extends RobotRule {
  def allowed(p: String): Boolean = !p.startsWith(prefix)
  def encode: String = "P" + prefix
}
final case class SuffixRule(suffix: String) extends RobotRule {
  def allowed(p: String): Boolean = !p.endsWith(suffix)
  def encode: String = "S" + suffix
}
final case class PrefixSuffixRule(prefix: String, suffix: String) extends RobotRule {
  def allowed(p: String): Boolean = !p.startsWith(prefix) && !p.endsWith(suffix)
  def encode: String = "B" + prefix + "" + suffix
}

final case class RobotEntry(userAgents: Set[String], rules: List[RobotRule]) {
  def allowed(path: String): Boolean = rules.forall(_.allowed(path))
}

final case class RobotRules(entries: List[RobotEntry], default: Option[RobotEntry]) {
  /** First matching specific-UA entry consulted exclusively; else default; else allow. */
  def allowed(userAgent: String, path: String): Boolean = {
    val ua = userAgent.split('/')(0).toLowerCase
    entries.find(_.userAgents.contains(ua)) match {
      case Some(e) => e.allowed(path)
      case None => default.forall(_.allowed(path))
    }
  }

  /** Compact, deterministic wire form for the robots state table. */
  def encode: String = {
    def enc(e: RobotEntry): String =
      e.userAgents.toSeq.sorted.mkString("") + "" +
        e.rules.map(_.encode).mkString("")
    (entries.map(enc) ++ default.map(enc).toList.map("*" + _))
      .mkString("")
  }
}

object RobotRules {
  val AllowAll: RobotRules = RobotRules(Nil, None)

  def decode(s: String): RobotRules = {
    if (s == null || s.isEmpty) return AllowAll
    var default: Option[RobotEntry] = None
    val entries = List.newBuilder[RobotEntry]
    s.split('').foreach { chunk =>
      val (isDefault, body) =
        if (chunk.startsWith("*")) (true, chunk.substring(2)) else (false, chunk)
      val Array(uas, rules) = body.split('') match {
        case Array(a) => Array(a, "")
        case arr => arr
      }
      val entry = RobotEntry(
        uas.split('').filter(_.nonEmpty).toSet,
        rules.split('').filter(_.nonEmpty).toList.map(decodeRule))
      if (isDefault) default = Some(entry) else entries += entry
    }
    RobotRules(entries.result(), default)
  }

  private def decodeRule(s: String): RobotRule = (s.head, s.tail) match {
    case ('E', p) => ExactRule(p)
    case ('A', _) => DenyAllRule
    case ('P', p) => PrefixRule(p)
    case ('S', p) => SuffixRule(p)
    case ('B', ps) =>
      val i = ps.indexOf('')
      PrefixSuffixRule(ps.substring(0, i), ps.substring(i + 1))
    case other => sys.error(s"bad rule encoding: $other")
  }

  /**
   * Parse a robots.txt body. Throws on nothing — but the reference wraps the
   * parse in try/catch and treats failure as all-allowed
   * (RobotsFilter.scala:99-103); URLDecoder can throw on stray '%', which we
   * let propagate so callers replicate that fallback.
   */
  def parse(file: String): RobotRules = {
    var entries = List[RobotEntry]()
    var default: Option[RobotEntry] = None
    var curUAs = Set[String]()
    var curRules = List[RobotRule]()
    // states: 0 Initial, 1 UserAgentSaw, 2 RuleSaw — RobotsParser.scala:8-11
    var status = 0

    def addEntry(): Unit = {
      val e = RobotEntry(curUAs, curRules)
      if (curUAs.contains("*")) { if (default.isEmpty) default = Some(e) }
      else entries = entries :+ e // reference prepends then scans via find;
      // prepend+linear-scan ≡ append+find for distinct UA groups; within
      // duplicate UA groups the reference's LAST group wins (prepend order) —
      // preserved below by reversing at lookup construction time.
      curUAs = Set(); curRules = Nil
    }

    for (line <- file.split('\n')) {
      if (line.isEmpty) {
        if (status == 1) { curUAs = Set(); curRules = Nil; status = 0 }
        else if (status == 2) { addEntry(); status = 0 }
      }
      val commentIndex = line.indexOf('#')
      val cleanLine =
        if (commentIndex == -1) line
        else if (commentIndex > 0) line.substring(0, commentIndex)
        else ""
      if (cleanLine.nonEmpty) {
        val pair = cleanLine.split(":", 2)
        val (key, value) =
          if (pair.length == 2) pair(0).toLowerCase -> URLDecoder.decode(pair(1).trim(), "UTF-8")
          else pair(0).toLowerCase -> ""
        if (key == "user-agent") {
          if (status == 2) addEntry()
          curUAs += value.toLowerCase
          status = 1
        } else if (key == "disallow") {
          if (status != 0) {
            val rulePair = value.split("\\*", 2)
            val rule: RobotRule =
              if (rulePair.length == 1) ExactRule(value)
              else if (rulePair(0).isEmpty && rulePair(1).isEmpty) DenyAllRule
              else if (rulePair(0).isEmpty) SuffixRule(value.substring(1))
              else if (rulePair(1).isEmpty) PrefixRule(value.substring(0, value.length - 1))
              else PrefixSuffixRule(rulePair(0), rulePair(1))
            // reference prepends rules but Entry.allowed ANDs them all —
            // order-insensitive, so append is equivalent (RobotsParser.scala:125-131)
            curRules = curRules :+ rule
            status = 2
          }
        }
      }
    }
    if (status == 2) addEntry()
    // reference stores entries newest-first and takes the first match
    // (RobotsParser.scala:28, 97-101): reverse so our `find` sees them the same way
    RobotRules(entries.reverse, default)
  }
}
