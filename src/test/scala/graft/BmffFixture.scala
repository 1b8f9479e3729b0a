package graft

/** Shared ISO-BMFF planted-payload builders — ONE definition of the box
  * grammar for every spec that feeds the HeaderCodecs walker
  * (MediaOpsSpec, TransformPropertySpec), so a layout change can't fix
  * one fixture and leave another passing against a stale shape.
  */
object BmffFixture {

  def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  def box(typ: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ body

  def ftyp: Array[Byte] = box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(0))

  /** mvhd v0: version/flags + creation + modification + timescale +
    * duration + rate/volume/reserved/matrix/predefined/next_track. */
  def mvhd(timescale: Int = 600, duration: Int = 1200): Array[Byte] =
    box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale.toLong) ++
      be32(duration.toLong) ++ new Array[Byte](80))

  /** tkhd v0: version/flags + creation/mod/track_id/reserved/duration
    * (20) + reserved/layer/alt/volume/reserved/matrix (52) + 16.16
    * width + height. */
  def tkhd(w: Int, h: Int): Array[Byte] =
    box("tkhd", be32(0) ++ new Array[Byte](20) ++ new Array[Byte](52) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))

  def hdlr(kind: String): Array[Byte] =
    box("hdlr", be32(0) ++ be32(0) ++ kind.getBytes("ISO-8859-1") ++
      new Array[Byte](12))

  /** The full spec-shaped payload: ftyp then moov{ mvhd (2.0 s), video
    * trak (640×360, hdlr vide), audio trak (0×0, hdlr soun) }. */
  def plantedMp4(): Array[Byte] = {
    val vtrak = box("trak", tkhd(640, 360) ++ box("mdia", hdlr("vide")))
    val atrak = box("trak", tkhd(0, 0) ++ box("mdia", hdlr("soun")))
    ftyp ++ box("moov", mvhd() ++ vtrak ++ atrak)
  }

  /** Movie header only — no tracks. */
  def minimalMp4(): Array[Byte] = ftyp ++ box("moov", mvhd())

  /** A structurally valid chain whose tkhd has an EMPTY body (size 8):
    * the walker must skip its fields, never read past the box. */
  def emptyTkhdMp4(): Array[Byte] =
    ftyp ++ box("moov", mvhd() ++
      box("trak", box("tkhd", Array.empty[Byte]) ++ box("mdia", hdlr("vide"))))
}
