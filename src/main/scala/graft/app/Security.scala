package graft.app

/** Per-construct security configuration — the Spark-native analog of the
  * reference's `set_security_conf` (application.py:4043) over
  * `ConstructSecurityConf` / `ConstructEncryption` /
  * `ConstructPersistenceSecurityDef` / `ConstructPassingSecurityDef` /
  * `ConstructProcessingSecurityDef` (constructs.py:173-231). The
  * reference's AWS drivers compile these into KMS keys and IAM policies
  * at activation; this platform maps every field to its LOCAL meaning
  * or refuses at activation — a demand it cannot honor (KMS key
  * allocation, network transfer protocols, cross-process privilege
  * separation) fails `activate()` loudly instead of silently no-op'ing:
  *
  *  - `persisting`: managed-output partitions are written under the
  *    declared restrictive POSIX mode (default `750` dirs / group-read
  *    files) — the data-at-rest enforcement surface a shared local/NFS
  *    store actually has. `encryption.keyAllocationLevel` other than
  *    `NONE` refuses (no KMS in-process).
  *  - `passing.protocol`: component transfer is in-process; only
  *    `in_process` (or empty) is satisfiable.
  *  - `processing.zeroSensitiveDataAfterUse`: executions already run in
  *    isolated sessions whose temp views die with them; the flag
  *    additionally clears the SparkContext-level cache after each
  *    execution. `enforcePrivilegeSeparation` refuses (single JVM).
  */
final case class EncryptionConf(
    keyAllocationLevel: String = "NONE",
    keyRotationCycleInDays: Option[Int] = None,
    isHardRotation: Boolean = false,
    reencryptOldDataDuringHardRotation: Boolean = false,
    trustAccessFromSameRoot: Boolean = true)

final case class PersistingSecurityDef(
    encryption: EncryptionConf = EncryptionConf(),
    /** POSIX mode applied to managed partition dirs (files get the same
      * mode minus execute bits). */
    posixMode: String = "750")

final case class PassingSecurityDef(protocol: String = "in_process")

final case class ProcessingSecurityDef(
    zeroSensitiveDataAfterUse: Boolean = false,
    enforcePrivilegeSeparation: Boolean = false)

final case class SecurityConf(
    persisting: Option[PersistingSecurityDef] = None,
    passing: Option[PassingSecurityDef] = None,
    processing: Option[ProcessingSecurityDef] = None)

sealed trait ConstructKind extends Serializable
object ConstructKind {
  case object Storage extends ConstructKind
  case object Processor extends ConstructKind
  case object RoutingTable extends ConstructKind
  case object BatchCompute extends ConstructKind
}

object SecurityConf {
  /** Fail-fast check of what the local platform can honor — run at
    * `activate()` like the reference's driver-side validation. */
  def validate(kind: ConstructKind, conf: SecurityConf): Unit = {
    conf.persisting.foreach { p =>
      require(p.encryption.keyAllocationLevel == "NONE",
        s"$kind security: encryption keyAllocationLevel " +
          s"'${p.encryption.keyAllocationLevel}' demands a KMS this " +
          "in-process platform does not have — refusing activation " +
          "rather than silently persisting unencrypted")
      require(p.posixMode.matches("[0-7]{3,4}"),
        s"$kind security: posixMode '${p.posixMode}' is not an octal mode")
    }
    conf.passing.foreach { p =>
      require(p.protocol.isEmpty || p.protocol == "in_process",
        s"$kind security: passing protocol '${p.protocol}' is not " +
          "satisfiable — component transfer here is in-process only")
    }
    conf.processing.foreach { p =>
      require(!p.enforcePrivilegeSeparation,
        s"$kind security: enforcePrivilegeSeparation demands process " +
          "isolation a single-JVM driver cannot provide — refusing")
    }
  }
}
