"""The worker-daemon preload module must always come up.

``spark.python.daemon.module`` points at ``dmp_crawler_spark.daemon_preload``
(see ``session.py``): if that module fails to import, EVERY Python-UDF task
in the session dies at worker launch — so the contract under test is
"importing the module never raises, leaves the heavy stack warm, and ends
with the preloaded heap frozen", in a subprocess so this test cannot be
satisfied by modules the test session itself already imported.
"""

import subprocess
import sys


def test_daemon_preload_imports_and_freezes():
    code = (
        "import gc, sys\n"
        "import dmp_crawler_spark.daemon_preload\n"
        "assert 'pandas' in sys.modules\n"
        "assert 'pyarrow' in sys.modules\n"
        "assert 'dmp_crawler_spark.extractors.htmlmini' in sys.modules\n"
        # gc.freeze() ran: the permanent generation holds the preloaded heap
        "assert gc.get_freeze_count() > 0\n"
        # and the daemon manager entrypoint is resolvable (not run)
        "from pyspark.daemon import manager\n"
        "print('PRELOAD_OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "PRELOAD_OK" in out.stdout
