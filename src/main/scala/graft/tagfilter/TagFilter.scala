package graft.tagfilter

import java.nio.file.{Files, Path, Paths}
import scala.util.matching.Regex

/** Tag-filter DSL — the reference's "query language"
  * (/root/reference/src/tagfilter.rs:74-201).
  *
  * AST + parser. The parser mirrors the reference's `FromStr` dispatch
  * order exactly (tagfilter.rs:111-201): `∨` split first (outermost),
  * then `∧`, then object-id prefixes, `=`, `∈`, `≠`, `∃(lrb)`, `∄(lrb)`,
  * `∃…∉`, `∉`, `~`, `∃~`, `∄~`, `∃`, `∄`, `k~re`, bare key.
  *
  * Regex semantics: Rust `Regex::is_match` is an unanchored substring
  * match — identical to Spark `rlike` / Java `Matcher.find`.
  */
sealed trait TagFilter {

  /** The reference's `Display` rendering (tagfilter.rs:27-62) — used in
    * output property keys (`is_in:<filter>`), so it must match exactly.
    */
  def display: String = this match {
    case TagFilter.HasK(k)               => s"∃$k"
    case TagFilter.HasReK(re)            => s"∃~${re.pattern.pattern}"
    case TagFilter.HasKLeftRightBoth(k)  => s"∃(lrb)$k"
    case TagFilter.NotHasKLeftRightBoth(k) => s"∄(lrb)$k"
    case TagFilter.NotHasK(k)            => s"∄$k"
    case TagFilter.NotHasReK(re)         => s"∄~${re.pattern.pattern}"
    case TagFilter.KV(k, v)              => s"$k=$v"
    case TagFilter.KneV(k, v)            => s"$k≠$v"
    case TagFilter.KinV(k, vs)           => s"$k∈${vs.mkString(",")}"
    case TagFilter.KnotInV(k, vs)        => s"$k∉${vs.mkString(",")}"
    case TagFilter.HasKnotInV(k, vs)     => s"∃$k∉${vs.mkString(",")}"
    case TagFilter.KreV(k, re)           => s"$k~${re.pattern.pattern}"
    case TagFilter.Or(fs)                => fs.map(_.display).mkString("∨")
    case TagFilter.And(fs)               => fs.map(_.display).mkString("∧")
    case TagFilter.OSMObj(incl, t, id)   => s"${if (incl) "" else "¬"}$t$id"
  }

  /** In-memory evaluation over a tag map (unit-test / local-algorithm
    * path; mirrors tagfilter.rs:72-109 `filter`).
    */
  def eval(tags: Map[String, String], objType: Char = 'w', objId: Long = 0L): Boolean =
    this match {
      case TagFilter.HasK(k)    => tags.contains(k)
      case TagFilter.HasReK(re) => tags.keys.exists(k => re.findFirstIn(k).isDefined)
      case TagFilter.HasKLeftRightBoth(k) =>
        tags.contains(k) || tags.contains(s"$k:both") ||
          (tags.contains(s"$k:left") && tags.contains(s"$k:right"))
      case TagFilter.NotHasKLeftRightBoth(k) =>
        !(tags.contains(k) || tags.contains(s"$k:both") ||
          (tags.contains(s"$k:left") && tags.contains(s"$k:right")))
      case TagFilter.NotHasK(k)    => !tags.contains(k)
      case TagFilter.NotHasReK(re) => !tags.keys.exists(k => re.findFirstIn(k).isDefined)
      case TagFilter.KV(k, v)      => tags.get(k).contains(v)
      case TagFilter.KneV(k, v)    => !tags.get(k).contains(v)
      case TagFilter.KinV(k, vs)   => tags.get(k).exists(vs.contains)
      case TagFilter.KnotInV(k, vs)    => tags.get(k).forall(v => !vs.contains(v))
      case TagFilter.HasKnotInV(k, vs) => tags.get(k).exists(v => !vs.contains(v))
      case TagFilter.KreV(k, re)   => tags.get(k).exists(v => re.findFirstIn(v).isDefined)
      case TagFilter.Or(fs)        => fs.exists(_.eval(tags, objType, objId))
      case TagFilter.And(fs)       => fs.forall(_.eval(tags, objType, objId))
      case TagFilter.OSMObj(incl, t, id) =>
        if (objType == t && objId == id) incl else !incl
    }
}

object TagFilter {
  final case class HasK(k: String) extends TagFilter
  final case class HasReK(re: Regex) extends TagFilter {
    override def equals(o: Any): Boolean = o match {
      case HasReK(r2) => re.pattern.pattern == r2.pattern.pattern
      case _          => false
    }
  }
  final case class HasKLeftRightBoth(k: String) extends TagFilter
  final case class NotHasKLeftRightBoth(k: String) extends TagFilter
  final case class NotHasK(k: String) extends TagFilter
  final case class NotHasReK(re: Regex) extends TagFilter {
    override def equals(o: Any): Boolean = o match {
      case NotHasReK(r2) => re.pattern.pattern == r2.pattern.pattern
      case _             => false
    }
  }
  final case class KV(k: String, v: String) extends TagFilter
  final case class KneV(k: String, v: String) extends TagFilter
  final case class KinV(k: String, vs: Seq[String]) extends TagFilter
  final case class KnotInV(k: String, vs: Seq[String]) extends TagFilter
  final case class HasKnotInV(k: String, vs: Seq[String]) extends TagFilter
  final case class KreV(k: String, re: Regex) extends TagFilter {
    override def equals(o: Any): Boolean = o match {
      case KreV(k2, r2) => k == k2 && re.pattern.pattern == r2.pattern.pattern
      case _            => false
    }
  }
  final case class Or(fs: Seq[TagFilter]) extends TagFilter
  final case class And(fs: Seq[TagFilter]) extends TagFilter
  final case class OSMObj(incl: Boolean, objType: Char, id: Long) extends TagFilter

  private val idPrefixes = Seq("w", "!w", "¬w", "r", "!r", "¬r")

  /** Parse a filter string; mirrors tagfilter.rs:111-201. */
  def parse(raw: String): Either[String, TagFilter] = {
    val s = raw.trim
    if (s.contains('∨')) {
      sequence(s.split('∨').toSeq.map(parse)).map(Or.apply)
    } else if (s.contains('∧')) {
      sequence(s.split('∧').toSeq.map(parse)).map(And.apply)
    } else {
      idPrefixes.collectFirst {
        case p if s.startsWith(p) && s.stripPrefix(p).nonEmpty &&
            s.stripPrefix(p).forall(_.isDigit) =>
          val id = s.stripPrefix(p).toLong
          p match {
            case "w"        => OSMObj(incl = true, 'w', id)
            case "!w" | "¬w" => OSMObj(incl = false, 'w', id)
            case "r"        => OSMObj(incl = true, 'r', id)
            case _          => OSMObj(incl = false, 'r', id)
          }
      } match {
        case Some(f) => Right(f)
        case None    => parseLeaf(s)
      }
    }
  }

  private def parseLeaf(s: String): Either[String, TagFilter] =
    if (s.contains('=')) {
      val Array(k, v) = s.split("=", 2)
      if (v.contains(',')) Right(KinV(k, v.split(',').toSeq)) else Right(KV(k, v))
    } else if (s.contains('∈')) {
      val Array(k, v) = s.split("∈", 2)
      Right(KinV(k, v.split(',').toSeq))
    } else if (s.contains('≠')) {
      val Array(k, v) = s.split("≠", 2)
      if (v.contains(',')) Right(KnotInV(k, v.split(',').toSeq)) else Right(KneV(k, v))
    } else if (s.startsWith("∃(lrb)")) {
      Right(HasKLeftRightBoth(s.stripPrefix("∃(lrb)")))
    } else if (s.startsWith("∄(lrb)")) {
      Right(NotHasKLeftRightBoth(s.stripPrefix("∄(lrb)")))
    } else if (s.startsWith("∃") && s.contains('∉')) {
      val Array(k, v) = s.stripPrefix("∃").split("∉", 2)
      Right(HasKnotInV(k, v.split(',').toSeq))
    } else if (s.contains('∉')) {
      val Array(k, v) = s.split("∉", 2)
      Right(KnotInV(k, v.split(',').toSeq))
    } else if (s.startsWith("~")) {
      compileRegex(s.stripPrefix("~")).map(HasReK.apply)
    } else if (s.startsWith("∃~")) {
      compileRegex(s.stripPrefix("∃~")).map(HasReK.apply)
    } else if (s.startsWith("∄~")) {
      compileRegex(s.stripPrefix("∄~")).map(NotHasReK.apply)
    } else if (s.startsWith("∃")) {
      Right(HasK(s.stripPrefix("∃")))
    } else if (s.startsWith("∄")) {
      Right(NotHasK(s.stripPrefix("∄")))
    } else if (s.contains('~')) {
      val Array(k, re) = s.split("~", 2)
      compileRegex(re).map(KreV(k, _))
    } else if (s.isEmpty) {
      Left("An empty string is not a valid tag filter")
    } else {
      Right(HasK(s))
    }

  private def compileRegex(p: String): Either[String, Regex] =
    try Right(new Regex(p))
    catch { case _: Exception => Left("Invalid regex") }

  private def sequence[A](xs: Seq[Either[String, A]]): Either[String, Seq[A]] =
    xs.foldRight(Right(Nil): Either[String, List[A]]) { (e, acc) =>
      for (a <- e; rest <- acc) yield a :: rest
    }

  def unsafeParse(s: String): TagFilter =
    parse(s).fold(e => throw new IllegalArgumentException(e), identity)
}

/** One rule of a filter function: `filter→T`, `filter→F`, `T`, `F`
  * (tagfilter.rs:203-264).
  */
sealed trait TagFilterFuncElem {
  def result(tags: Map[String, String]): Option[Boolean] = this match {
    case TagFilterFuncElem.AlwaysTrue     => Some(true)
    case TagFilterFuncElem.AlwaysFalse    => Some(false)
    case TagFilterFuncElem.ThenTrue(f)    => if (f.eval(tags)) Some(true) else None
    case TagFilterFuncElem.ThenFalse(f)   => if (f.eval(tags)) Some(false) else None
  }
}
object TagFilterFuncElem {
  case object AlwaysTrue extends TagFilterFuncElem
  case object AlwaysFalse extends TagFilterFuncElem
  final case class ThenTrue(f: TagFilter) extends TagFilterFuncElem
  final case class ThenFalse(f: TagFilter) extends TagFilterFuncElem

  def parse(raw: String): Either[String, TagFilterFuncElem] = {
    val s = raw.trim
    if (s == "T") Right(AlwaysTrue)
    else if (s == "F") Right(AlwaysFalse)
    else if (s.endsWith("→T")) TagFilter.parse(s.stripSuffix("→T")).map(ThenTrue.apply)
    else if (s.endsWith("→F")) TagFilter.parse(s.stripSuffix("→F")).map(ThenFalse.apply)
    else Left(s"Unknown Tag Filter Func: $s")
  }
}

/** First-match-decides rule chain, e.g.
  * `waterway=canal∧lock=yes→T;waterway=canal→F;waterway→T;F`
  * (tagfilter.rs:266-350). Supports `@filename` indirection, recursive
  * `include f;`, and `#` line comments.
  */
final case class TagFilterFunc(elems: Seq[TagFilterFuncElem]) {
  def result(tags: Map[String, String]): Option[Boolean] =
    elems.iterator.map(_.result(tags)).collectFirst { case Some(b) => b }
}

object TagFilterFunc {
  private val includeRe = "(?m)^include ([^;]+);".r
  private val commentRe = "#[^\n]*\n".r

  def parse(raw: String): Either[String, TagFilterFunc] = {
    val (fileDir, contents): (Option[Path], String) =
      if (raw.startsWith("@")) {
        val fn = raw.stripPrefix("@")
        (Option(Paths.get(fn).getParent), Files.readString(Paths.get(fn)))
      } else (None, raw)

    var s = contents.trim
    var changed = true
    while (changed) {
      val next = includeRe.replaceAllIn(
        s,
        m => {
          val dir = fileDir.getOrElse(
            throw new IllegalStateException("Can't do include without @filename"))
          Regex.quoteReplacement(Files.readString(dir.resolve(m.group(1))))
        })
      changed = next != s
      s = next
    }
    s = commentRe.replaceAllIn(s, "")

    val parts = s.split(';').map(_.trim).filter(_.nonEmpty).toSeq
    parts.foldRight(Right(Nil): Either[String, List[TagFilterFuncElem]]) { (p, acc) =>
      for (e <- TagFilterFuncElem.parse(p); rest <- acc) yield e :: rest
    }.map(TagFilterFunc.apply)
  }

  def unsafeParse(s: String): TagFilterFunc =
    parse(s).fold(e => throw new IllegalArgumentException(e), identity)
}
