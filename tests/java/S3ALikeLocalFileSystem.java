package bosql.testing;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;

/**
 * Hadoop FileSystem TEST DOUBLE for the CAS scheme-matrix contract test
 * (tests/test_sinks.py::test_cas_scheme_matrix_s3a_contract): the full
 * FileSystem API over local disk, registered under a non-local scheme
 * (fs.s3a.impl / fs.mock.impl) so the snapshot store's capability probe
 * and claim arbitration run through the exact JVM code paths an object
 * store would. RawLocalFileSystem rejects foreign-scheme paths in
 * checkPath ("Wrong FS"), which is the only behavior the double must
 * relax; everything else (create overwrite=false semantics included) is
 * stock Hadoop. Compiled on the fly by tests/conftest.py when a JDK is
 * present; the dependent test skips with a reason otherwise.
 */
public class S3ALikeLocalFileSystem extends RawLocalFileSystem {
  @Override
  protected void checkPath(Path path) {
    // accept any scheme: the double serves whatever scheme it was
    // registered under; path->file resolution ignores the scheme
  }
}
