package graft.stream

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{BufferSpec, NodeName, OpSpec, StreamNode}

/** JSON (de)serialization of stream-node specs — the stored-function doc
  * payload for `:stored-function/type :stream` (FIXTURES.md §B; field names
  * mirror `create-stream!` params,
  * `/root/reference/src/dataworks/stream.clj:117-133`).
  *
  * Shape:
  * ```json
  * { "name": "stream/process", "upstream": ["kafka/input"],
  *   "buffer": 1000 | {"sliding": 10} | {"dropping": 10},
  *   "transducer": {"map": "<sql expr>"} | {"filter": "<pred>"} |
  *                 {"select": ["e1", …]} | {"named": "fn"} |
  *                 {"comp": [ …stages… ]} | {"windowAgg": {…}} |
  *                 {"dedupe": {…}} |
  *                 {"sessionAgg": {"ts": "ts", "gap": "5 minutes",
  *                                 "watermark": "1 minute",
  *                                 "groupBy": ["key", …],  // required nonempty
  *                                 "aggs": ["count(*) AS n", …]}} |
  *                 {"asofEnrich": {"dim": "<parquet path>", "key": "k",
  *                                 "eventTs": "ts", "dimTs": "vts",
  *                                 "carry": ["price", …]}} |
  *                 {"scrubPii": "<text column>"},
  *   "errorSink": "kafka/errors", "format": "json" | "edn" }
  * ```
  * Replaces the reference's eval of Clojure transducer strings with a
  * declarative spec (SURVEY.md §7.4 risk 5) — same deploy surface (a doc in
  * the app db + a control-plane event), no runtime code eval.
  */
object NodeSpec {
  private implicit val formats: Formats = DefaultFormats

  def parseOpSpec(j: JValue): Option[OpSpec] = j match {
    case JObject(fields) => fields.toMap match {
      case m if m.contains("map") => m("map").extractOpt[String].map(OpSpec.MapExpr)
      case m if m.contains("filter") => m("filter").extractOpt[String].map(OpSpec.FilterExpr)
      case m if m.contains("select") =>
        m("select").extractOpt[Seq[String]].map(OpSpec.SelectExpr)
      case m if m.contains("named") => m("named").extractOpt[String].map(OpSpec.Named(_))
      case m if m.contains("comp") => m("comp") match {
        case JArray(stages) =>
          val parsed = stages.map(parseOpSpec)
          if (parsed.forall(_.isDefined)) Some(OpSpec.Comp(parsed.flatten)) else None
        case _ => None
      }
      // F7 ->let: {"let": {"bindings": [{"name": "n", "expr": "e"}, …],
      //                    "in": [stage, …]}} — bindings are ORDERED (an
      // array, not an object: later bindings see earlier ones)
      case m if m.contains("let") =>
        val l = m("let")
        val bindings = l \ "bindings" match {
          case JArray(bs) =>
            val parsed = bs.map(b => for {
              n <- (b \ "name").extractOpt[String] if n.nonEmpty
              e <- (b \ "expr").extractOpt[String] if e.nonEmpty
            } yield (n, e))
            if (parsed.nonEmpty && parsed.forall(_.isDefined)) Some(parsed.flatten)
            else None
          case _ => None
        }
        val body = l \ "in" match {
          case JArray(stages) =>
            val parsed = stages.map(parseOpSpec)
            if (parsed.nonEmpty && parsed.forall(_.isDefined)) Some(parsed.flatten)
            else None
          case _ => None
        }
        for (bs <- bindings; b <- body) yield OpSpec.LetExpr(bs, b)
      case m if m.contains("windowAgg") =>
        val w = m("windowAgg")
        for {
          ts <- (w \ "ts").extractOpt[String]
          dur <- (w \ "window").extractOpt[String]
          wm <- (w \ "watermark").extractOpt[String]
          aggs <- (w \ "aggs").extractOpt[Seq[String]] if aggs.nonEmpty
        } yield OpSpec.WindowAgg(ts, dur, (w \ "slide").extractOpt[String], wm,
          (w \ "groupBy").extractOpt[Seq[String]].getOrElse(Nil), aggs)
      case m if m.contains("dedupe") =>
        val d = m("dedupe")
        for {
          keys <- (d \ "keys").extractOpt[Seq[String]] if keys.nonEmpty
          ts <- (d \ "ts").extractOpt[String]
          wm <- (d \ "watermark").extractOpt[String]
        } yield OpSpec.DedupeKeys(keys, ts, wm)
      case m if m.contains("sessionAgg") =>
        val w = m("sessionAgg")
        for {
          ts <- (w \ "ts").extractOpt[String]
          gap <- (w \ "gap").extractOpt[String]
          wm <- (w \ "watermark").extractOpt[String]
          aggs <- (w \ "aggs").extractOpt[Seq[String]] if aggs.nonEmpty
          // unlike windowAgg (where a global aggregate is legal), streaming
          // forbids session windows without grouping keys — an empty
          // groupBy would deploy a node whose query dies at start
          keys <- (w \ "groupBy").extractOpt[Seq[String]] if keys.nonEmpty
        } yield OpSpec.SessionAgg(ts, gap, wm, keys, aggs)
      case m if m.contains("scrubPii") =>
        m("scrubPii").extractOpt[String].map(OpSpec.ScrubPii)
      case m if m.contains("bloomAdmit") =>
        val a = m("bloomAdmit")
        for {
          model <- (a \ "model").extractOpt[String]
          frac <- (a \ "maxHitFracQ6").extractOpt[Long] if frac >= 0L
          text <- (a \ "text").extractOpt[String]
        } yield OpSpec.BloomAdmit(model, frac, text)
      case m if m.contains("classifierAdmit") =>
        val a = m("classifierAdmit")
        for {
          model <- (a \ "model").extractOpt[String]
          min <- (a \ "minScoreQ6").extractOpt[Long] if min >= 0L
          text <- (a \ "text").extractOpt[String]
        } yield OpSpec.ClassifierAdmit(model, min, text)
      case m if m.contains("quotaAdmit") =>
        val a = m("quotaAdmit")
        val ttl = (a \ "ttlMillis").extractOpt[Long]
        for {
          key <- (a \ "key").extractOpt[String]
          cap <- (a \ "cap").extractOpt[Long] if cap > 0L
          if ttl.forall(_ > 0L)
        } yield OpSpec.QuotaAdmit(key, cap, ttl)
      case m if m.contains("asofEnrich") =>
        val a = m("asofEnrich")
        for {
          dim <- (a \ "dim").extractOpt[String]
          key <- (a \ "key").extractOpt[String]
          ets <- (a \ "eventTs").extractOpt[String]
          dts <- (a \ "dimTs").extractOpt[String]
          carry <- (a \ "carry").extractOpt[Seq[String]] if carry.nonEmpty
        } yield OpSpec.AsOfEnrich(dim, key, ets, dts, carry)
      case m if m.contains("intervalJoin") =>
        val a = m("intervalJoin")
        for {
          right <- (a \ "right").extractOpt[String]
          key <- (a \ "key").extractOpt[String]
          lb <- (a \ "lookback").extractOpt[String]
          wm <- (a \ "watermark").extractOpt[String]
          carry <- (a \ "carry").extractOpt[Seq[String]] if carry.nonEmpty
        } yield OpSpec.IntervalJoin(right, key, lb,
          (a \ "lookahead").extractOpt[String].getOrElse("0 seconds"), wm, carry)
      case _ => None
    }
    case _ => None
  }

  private def parseBuffer(j: JValue): Option[BufferSpec] = j match {
    case JInt(n) => Some(BufferSpec.Fixed(n.toInt))
    case JObject(fs) => fs.toMap match {
      case m if m.contains("sliding") => m("sliding").extractOpt[Int].map(BufferSpec.Sliding)
      case m if m.contains("dropping") => m("dropping").extractOpt[Int].map(BufferSpec.Dropping)
      case _ => None
    }
    case _ => None
  }

  /** Total: malformed spec → None (the validation railway reports upstream).
    * STRICT on present fields: a `transducer`/`buffer`/`upstream` key that
    * exists but doesn't parse fails the WHOLE spec — silently dropping it
    * would deploy a node that does something different from what was
    * written (an unparseable filter would pass every row; a string-typed
    * `upstream` would turn the node into a source reading its own topic). */
  def parse(json: String): Option[StreamNode] =
    try {
      val j = JsonMethods.parse(json)
      def strictly[A](v: JValue, p: JValue => Option[A]): Option[Option[A]] =
        v match {
          case JNothing => Some(None) // absent is fine
          case present => p(present).map(Some(_)) // present must parse
        }
      for {
        name <- (j \ "name").extractOpt[String]
        transducer <- strictly(j \ "transducer", parseOpSpec)
        buffer <- strictly(j \ "buffer", parseBuffer)
        upstream <- strictly[Set[String]](j \ "upstream", _.extractOpt[Set[String]])
      } yield StreamNode(
        NodeName.parse(name),
        upstream.getOrElse(Set.empty),
        transducer,
        buffer,
        (j \ "errorSink").extractOpt[String],
        (j \ "format").extractOpt[String].getOrElse("json"))
    } catch { case _: Throwable => None }

  def toJson(n: StreamNode): String = {
    def op(o: OpSpec): JValue = o match {
      case OpSpec.MapExpr(e) => JObject("map" -> JString(e))
      case OpSpec.FilterExpr(p) => JObject("filter" -> JString(p))
      case OpSpec.SelectExpr(es) => JObject("select" -> JArray(es.map(JString(_)).toList))
      case OpSpec.Named(f, _) => JObject("named" -> JString(f))
      case OpSpec.Comp(ss) => JObject("comp" -> JArray(ss.map(op).toList))
      case OpSpec.LetExpr(bindings, body) =>
        JObject("let" -> JObject(
          "bindings" -> JArray(bindings.toList.map { case (n, e) =>
            JObject("name" -> JString(n), "expr" -> JString(e)) }),
          "in" -> JArray(body.map(op).toList)))
      case OpSpec.WindowAgg(ts, dur, slide, wm, keys, aggs) =>
        JObject("windowAgg" -> JObject(List(
          Some("ts" -> (JString(ts): JValue)),
          Some("window" -> (JString(dur): JValue)),
          slide.map(s => "slide" -> (JString(s): JValue)),
          Some("watermark" -> (JString(wm): JValue)),
          Some("groupBy" -> (JArray(keys.map(JString(_)).toList): JValue)),
          Some("aggs" -> (JArray(aggs.map(JString(_)).toList): JValue))).flatten: _*))
      case OpSpec.DedupeKeys(keys, ts, wm) =>
        JObject("dedupe" -> JObject(
          "keys" -> JArray(keys.map(JString(_)).toList),
          "ts" -> JString(ts), "watermark" -> JString(wm)))
      case OpSpec.SessionAgg(ts, gap, wm, keys, aggs) =>
        JObject("sessionAgg" -> JObject(
          "ts" -> JString(ts), "gap" -> JString(gap),
          "watermark" -> JString(wm),
          "groupBy" -> JArray(keys.map(JString(_)).toList),
          "aggs" -> JArray(aggs.map(JString(_)).toList)))
      case OpSpec.AsOfEnrich(dim, key, ets, dts, carry) =>
        JObject("asofEnrich" -> JObject(
          "dim" -> JString(dim), "key" -> JString(key),
          "eventTs" -> JString(ets), "dimTs" -> JString(dts),
          "carry" -> JArray(carry.map(JString(_)).toList)))
      case OpSpec.IntervalJoin(right, key, lb, la, wm, carry) =>
        JObject("intervalJoin" -> JObject(
          "right" -> JString(right), "key" -> JString(key),
          "lookback" -> JString(lb), "lookahead" -> JString(la),
          "watermark" -> JString(wm),
          "carry" -> JArray(carry.map(JString(_)).toList)))
      case OpSpec.ScrubPii(tc) => JObject("scrubPii" -> JString(tc))
      case OpSpec.BloomAdmit(model, frac, text) =>
        JObject("bloomAdmit" -> JObject(
          "model" -> JString(model), "maxHitFracQ6" -> JInt(frac),
          "text" -> JString(text)))
      case OpSpec.QuotaAdmit(key, cap, ttl) =>
        JObject("quotaAdmit" -> JObject(List(
          "key" -> JString(key), "cap" -> JInt(cap)) ++
          ttl.map(t => "ttlMillis" -> JInt(t): (String, JValue)).toList))
      case OpSpec.ClassifierAdmit(model, min, text) =>
        JObject("classifierAdmit" -> JObject(
          "model" -> JString(model), "minScoreQ6" -> JInt(min),
          "text" -> JString(text)))
    }
    val buf: Option[JValue] = n.buffer.map {
      case BufferSpec.Fixed(x) => JInt(x)
      case BufferSpec.Sliding(x) => JObject("sliding" -> JInt(x))
      case BufferSpec.Dropping(x) => JObject("dropping" -> JInt(x))
    }
    val fields: List[(String, JValue)] = List[Option[(String, JValue)]](
      Some("name" -> JString(n.name.full)),
      Some("upstream" -> JArray(n.upstream.toList.sorted.map(JString(_)))),
      n.transducer.map(t => "transducer" -> op(t)),
      buf.map("buffer" -> _),
      n.errorSink.map(e => "errorSink" -> JString(e)),
      Some("format" -> JString(n.format))).flatten
    JsonMethods.compact(JsonMethods.render(JObject(fields: _*)))
  }
}
