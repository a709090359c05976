package graft.ops

/** Decoded canonical audio: sample rate plus the mono signed-16-bit
  * sample stream (widened to Int — the feature/fingerprint folds do
  * their arithmetic in Long either way). */
final case class DecodedPcm(rate: Long, samples: Array[Int])

/** The pluggable audio-decode seam (r13 verdict task 5): EVERY audio
  * kernel — the q161 feature fold, the q162/q163 gain-invariant
  * fingerprints, and therefore every artifact and gate face built
  * through them — consumes payload bytes ONLY through this interface,
  * at the existing `mapPartitions` decode boundary.
  *
  * Why a seam and not a decoder: the JDK ships no MP3/AAC entropy
  * decoder and the engine's no-new-deps policy holds, so compressed
  * audio is a deliberately EMPTY codec boundary — the canonical-PCM
  * header gate (E200) routes MP3 frame-sync / ID3 / AAC-ADTS /
  * RIFF-wrapped-MP3 payloads to T5 instead of decoding garbage. The
  * seam turns "drop a decoder into the stage" (a code change) into
  * "register a codec" (a config change): a production MP3 codec is a
  * `AudioCodec` implementation shipped in the job jar and registered
  * at session setup; nothing else in the engine moves, and the
  * downstream semantics (features, fingerprints, gates, ledgers) are
  * proven codec-independent by the stub-codec spec arm
  * (ObserveSpec).
  *
  * Codecs must be `Serializable`: call sites capture the REGISTERED
  * LIST at plan-build time and ship it inside the task closure, so on
  * a real cluster the executors run exactly the codecs the driver
  * registered — never a JVM-local registry lookup that silently
  * differs per executor.
  *
  * A codec returns None for payloads that are not its container (or
  * are torn/hostile) — the chain tries the next codec, and a payload
  * no codec accepts is T5: zero features, zero fingerprints, flows to
  * quarantine accounting, never a wrong answer. */
trait AudioCodec extends Serializable {
  def decode(payload: Array[Byte]): Option[DecodedPcm]
}

/** The in-tree default codec: canonical RIFF/WAVE PCM — wFormatTag 1,
  * 16-bit, MONO. The mono requirement is part of the gate (ADVICE
  * r13): a canonical STEREO PCM16 WAV would otherwise pass the header
  * check and have its interleaved L/R samples decoded as one mono
  * stream — the same silent-wrong-features class the wFormatTag check
  * closes for compressed codecs. A multichannel decode belongs to a
  * registered codec that downmixes explicitly, not to an accidental
  * interleave. Header layout per the public RIFF/WAVE spec: fmt tag
  * at 20, channels at 22, sample rate at 24, bits-per-sample at 34,
  * body at 44 (the canonical 16-byte fmt chunk every fixture and the
  * oracle's reconstruction use). */
object CanonicalPcmWav extends AudioCodec {
  override def decode(p: Array[Byte]): Option[DecodedPcm] = {
    def ascii(i: Int, sTag: String): Boolean =
      i + sTag.length <= p.length &&
        sTag.indices.forall(j => p(i + j) == sTag.charAt(j).toByte)
    if (!(p.length >= 44 && ascii(0, "RIFF") && ascii(8, "WAVE") &&
        p(20) == 1 && p(21) == 0 && // wFormatTag: PCM
        p(22) == 1 && p(23) == 0 && // nChannels: mono
        p(34) == 16 && p(35) == 0)) // 16-bit samples
      None
    else {
      def le32(i: Int): Long =
        ((p(i + 3) & 0xFFL) << 24) | ((p(i + 2) & 0xFFL) << 16) |
          ((p(i + 1) & 0xFFL) << 8) | (p(i) & 0xFFL)
      val body = 44
      val n = (p.length - body) / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val lo = p(body + 2 * i) & 0xFF
        val hi = p(body + 2 * i + 1) & 0xFF
        val u = hi * 256 + lo
        out(i) = if (u >= 32768) u - 65536 else u
        i += 1
      }
      Some(DecodedPcm(le32(24), out))
    }
  }
}

/** The codec registry: the canonical PCM codec is always first;
  * registered codecs extend the chain in registration order. Call
  * sites snapshot [[registered]] at plan time (see [[AudioCodec]]'s
  * serialization contract). */
object AudioCodecs {
  @volatile private var extras: Seq[AudioCodec] = Nil

  /** The current decode chain, canonical PCM first. */
  def registered: Seq[AudioCodec] = CanonicalPcmWav +: extras

  def register(c: AudioCodec): Unit = synchronized { extras = extras :+ c }

  /** Run `body` with `c` registered, restoring the previous chain
    * after — the spec-arm shape (and the session-scoped registration
    * pattern for ops runbooks). */
  def withCodec[T](c: AudioCodec)(body: => T): T = synchronized {
    val prev = extras
    extras = extras :+ c
    try body finally extras = prev
  }

  /** First codec that accepts the payload, or None (T5). */
  def decodeWith(codecs: Seq[AudioCodec],
      p: Array[Byte]): Option[DecodedPcm] = {
    val it = codecs.iterator
    while (it.hasNext) {
      val d = it.next().decode(p)
      if (d.isDefined) return d
    }
    None
  }
}
