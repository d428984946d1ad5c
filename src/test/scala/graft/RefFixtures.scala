package graft

/** Locates the reference checkout used by golden/verbatim-fixture tests.
  *
  * The root comes from `GRAFT_REFERENCE_ROOT` (default `/root/reference`)
  * so the suite runs on machines with the checkout elsewhere; tests that
  * need a fixture guard with `assume(RefFixtures.available(...))` and are
  * CANCELED (not failed) where the checkout is absent.
  */
object RefFixtures {
  val root: String = sys.env.getOrElse("GRAFT_REFERENCE_ROOT", "/root/reference")

  def path(rel: String): java.nio.file.Path = java.nio.file.Paths.get(root, rel)

  def available(rels: String*): Boolean =
    rels.forall(r => java.nio.file.Files.exists(path(r)))

  def read(rel: String): String = java.nio.file.Files.readString(path(rel))
}
