package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Tiny ujson-flavored facade over Jackson (shipped with Spark) so tests can
  * read golden fixtures without extra dependencies. */
object ujsonLite {
  final case class Value(node: JsonNode) {
    def apply(field: String): Value = Value(node.get(field))
    def arr: Vector[Value] = node.elements().asScala.map(Value(_)).toVector
    def str: String = node.asText()
    def num: Double = node.asDouble()
    def bool: Boolean = node.asBoolean()
    def isNull: Boolean = node == null || node.isNull
  }
  private val mapper = new ObjectMapper()
  def parse(s: String): Value = Value(mapper.readTree(s))
}
