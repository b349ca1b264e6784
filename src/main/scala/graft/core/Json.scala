package graft.core

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Jackson-based JSON codec for timeline metadata (case classes only). */
object Json {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }
  def write(v: Any): String = mapper.writeValueAsString(v)
  def read[T](s: String, clazz: Class[T]): T = mapper.readValue(s, clazz)
  /** For parameterized targets (e.g. a bare `Map[String, ColStat]`)
    * where a Class token erases the value type. */
  def read[T](s: String, tref: com.fasterxml.jackson.core.`type`.TypeReference[T]): T =
    mapper.readValue(s, tref)
}
