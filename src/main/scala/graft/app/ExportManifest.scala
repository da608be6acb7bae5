package graft.app

import org.apache.hadoop.fs.Path
import graft.dimension.DimSpec
import graft.signal.DatasetAttrs

/** One node granted to a downstream application: enough for the
  * downstream to construct the input signal without re-declaring
  * anything (spec + attrs travel with the grant). */
final case class ExportedNode(nodeId: String, spec: DimSpec,
                              attrs: DatasetAttrs)

/** Downstream-app grant manifest (reference
  * export_to_downstream_application, application.py:3961-3963), persisted
  * under `<upstreamRoot>/exports/<downstreamId>.bin` so the downstream's
  * import works across processes — the durable face of the reference's
  * conf.set_downstream registration.
  *
  * `owner` stamps WHO wrote the grant (the exporting app's owner id —
  * OS user by default) and `authorizedOwners` is the explicit
  * cross-owner allow-list: an importing app whose owner differs from
  * the stamp is refused unless listed — the local analog of the
  * reference's `authorize_external_entity` (application.py), where an
  * external account only gains access when the resource owner grants it
  * BY NAME. Same-owner collaboration needs no listing. */
final case class ExportManifest(upstreamName: String, downstreamId: String,
                                nodes: List[ExportedNode],
                                owner: String = "",
                                authorizedOwners: Set[String] = Set.empty) {
  /** True when `importer` may consume this grant: the owner itself, a
    * listed external owner, or a pre-r17 unstamped manifest (owner
    * empty — no ACL to enforce). */
  def authorizes(importer: String): Boolean =
    owner.isEmpty || importer == owner || authorizedOwners.contains(importer)
}

object ExportManifest {

  private def fileFor(rootDir: String, downstreamId: String): Path =
    new Path(s"$rootDir/exports", s"$downstreamId.bin")

  def save(manifest: ExportManifest, rootDir: String,
           conf: org.apache.hadoop.conf.Configuration): String = {
    val f = fileFor(rootDir, manifest.downstreamId)
    val fs = f.getFileSystem(conf)
    AtomicFile.replace(fs, f) { raw =>
      val out = new java.io.ObjectOutputStream(raw)
      out.writeObject(manifest); out.flush()
    }
    f.toString
  }

  def load(rootDir: String, downstreamId: String,
           conf: org.apache.hadoop.conf.Configuration): Option[ExportManifest] = {
    val f = fileFor(rootDir, downstreamId)
    val fs = f.getFileSystem(conf)
    AtomicFile.read(fs, f) { p =>
      val in = new java.io.ObjectInputStream(fs.open(p))
      try in.readObject().asInstanceOf[ExportManifest] finally in.close()
    }
  }
}
