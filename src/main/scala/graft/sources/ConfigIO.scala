package graft.sources

/** S7: minimal parser for the reference's client config file
  * (pulsar_remote_inspector.py:35-41,86-90,139-158) — a two-level
  * YAML mapping of contexts → key/value settings:
  *
  * {{{
  * contexts:
  *   my-cluster:
  *     admin-service-url: https://...
  *     bootstrap-service-url: pulsar+ssl://...
  * auth-info:
  *   my-cluster:
  *     token: ...
  * }}}
  *
  * Driver-side pure Scala (no YAML dependency is available in the
  * zero-egress build, and config parsing is control-plane, not
  * dataflow). Supports exactly the subset the reference uses: nested
  * mappings by 2-space indentation, `key: value` leaves, `#` comments
  * and blank lines. */
object ConfigIO {

  /** section → name → key → value */
  def parseContexts(text: String): Map[String, Map[String, Map[String, String]]] = {
    var out = Map.empty[String, Map[String, Map[String, String]]]
    var section: String = null
    var name: String = null
    text.linesIterator.foreach { raw =>
      // YAML comment rule: '#' opens a comment only at line start or
      // after whitespace — a '#' INSIDE a value (URL fragment, token)
      // is data, and truncating it would silently corrupt the value
      val commentIdx = raw.indices.find(i => raw(i) == '#' &&
        (i == 0 || raw(i - 1) == ' ' || raw(i - 1) == '\t'))
      val noComment = commentIdx.map(raw.substring(0, _)).getOrElse(raw)
      val line = noComment.trim
      if (line.nonEmpty) {
        val indent = noComment.takeWhile(_ == ' ').length
        val (k, v) = line.span(_ != ':')
        val value = v.stripPrefix(":").trim
        if (indent == 0 && value.isEmpty) {
          section = k.trim; name = null
          out = out.updatedWith(section)(o => Some(o.getOrElse(Map.empty)))
        } else if (indent == 2 && value.isEmpty && section != null) {
          name = k.trim
          out = out.updatedWith(section)(o =>
            Some(o.getOrElse(Map.empty).updatedWith(name)(n =>
              Some(n.getOrElse(Map.empty)))))
        } else if (indent >= 4 && section != null && name != null) {
          out = out.updatedWith(section)(o =>
            Some(o.getOrElse(Map.empty).updatedWith(name)(n =>
              Some(n.getOrElse(Map.empty) + (k.trim -> value)))))
        }
      }
    }
    out
  }
}
