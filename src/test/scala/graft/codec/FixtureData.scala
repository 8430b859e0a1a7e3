package graft.codec

/** Golden fixtures transcribed mechanically from the reference test suite
  * (/root/reference/src/Data/RLE.hs:279-320, /root/reference/src/Data/MTF.hs:287-299).
  * Test DATA only — pins bit-identical behavior.
  */
object FixtureData {
  val s1 = "aaaabbbbcccc"
  val rle1: Vector[Option[String]] = Vector(Some("1"),Some("c"),Some("1"),None,Some("4"),Some("a"),Some("3"),Some("b"),Some("3"),Some("c"),Some("1"),Some("b"))
  val s2 = "editor-mount-z0Uz0Uz0Uz0Uz0Uz0Uz0Uz5Uz0Uz0Uz0Uz2Uz3Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz1Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz1Uz0Uz0Uz0Uz2Uz1Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz1cUz0Uz0Uz0Uz1Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uznz0e9Uz7dUz20Uz0ffUz11Uz40Uz0a3Uz9aUz0bfU3z0f5Uz12Uz0a8Uzhz4Uz0Uz0Uz0Uz2Uz4Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz2Uz0Uz0Uz0Uz2Uz3Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz1Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz1Uz0Uz0Uz0Uz2Uz3Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz1Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz1cUz0Uz0Uz0Uz1Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uz0Uznz0e9Uz7dUz20Uz0ffUz11Uz40Uz0a3Uz9aUz0bfU3z0f5Uz12Uz0a8Uzhz4Uz4U"
  val rle2: Vector[Option[String]] = Vector(
    Some("1"), Some("U"), Some("1"), Some("r"), Some("1"), Some("t"), Some("102"), Some("z"),
    Some("2"), Some("4"), Some("2"), Some("2"), Some("42"), Some("z"), Some("2"), Some("1"),
    Some("5"), Some("z"), Some("2"), Some("1"), Some("8"), Some("z"), Some("2"), Some("a"),
    Some("2"), Some("U"), Some("7"), Some("z"), Some("2"), Some("f"), Some("2"), Some("z"),
    Some("2"), Some("a"), Some("2"), Some("e"), Some("2"), Some("z"), Some("1"), Some("4"),
    Some("2"), Some("f"), Some("3"), Some("3"), Some("1"), Some("1"), Some("1"), Some("4"),
    Some("15"), Some("0"), Some("2"), Some("1"), Some("3"), Some("0"), Some("2"), Some("1"),
    Some("1"), Some("0"), Some("1"), Some("1"), Some("36"), Some("0"), Some("2"), Some("c"),
    Some("8"), Some("0"), Some("1"), Some("1"), Some("1"), Some("5"), Some("1"), Some("2"),
    Some("1"), Some("1"), Some("1"), Some("4"), Some("41"), Some("0"), Some("2"), Some("2"),
    Some("2"), Some("a"), Some("2"), Some("0"), Some("2"), Some("f"), Some("2"), Some("5"),
    Some("1"), Some("2"), Some("9"), Some("0"), Some("2"), Some("d"), Some("6"), Some("0"),
    Some("3"), Some("2"), Some("2"), Some("1"), Some("1"), Some("4"), Some("1"), Some("2"),
    Some("1"), Some("0"), Some("2"), Some("9"), Some("2"), Some("3"), Some("2"), Some("8"),
    Some("6"), Some("0"), Some("2"), Some("9"), Some("2"), Some("0"), Some("2"), Some("1"),
    Some("2"), Some("7"), Some("1"), Some("e"), Some("2"), Some("0"), Some("1"), None,
    Some("2"), Some("0"), Some("2"), Some("b"), Some("2"), Some("f"), Some("2"), Some("0"),
    Some("2"), Some("z"), Some("1"), Some("d"), Some("1"), Some("-"), Some("1"), Some("u"),
    Some("2"), Some("z"), Some("1"), Some("t"), Some("1"), Some("m"), Some("1"), Some("o"),
    Some("1"), Some("n"), Some("1"), Some("i"), Some("1"), Some("o"), Some("30"), Some("U"),
    Some("1"), Some("-"), Some("95"), Some("U"), Some("2"), Some("n"), Some("2"), Some("3"),
    Some("31"), Some("U"), Some("2"), Some("h"), Some("9"), Some("U")
  )
}
