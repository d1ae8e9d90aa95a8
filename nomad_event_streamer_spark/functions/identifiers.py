"""Task-identifier construction (app.rb:143-144).

The reference builds ``task_identifier = "{namespace}/{job}.{task}"`` and
elides the ``namespace/`` prefix when the namespace is ``"default"``::

    task_identifier = "#{namespace + "/" unless namespace == "default"}#{job_id}.#{task_id}"

Pure-Column equivalent (conditional elision via when/otherwise + concat).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def task_identifier(
    namespace: Column, job_id: Column, task_id: Column, default: str = "default"
) -> Column:
    prefix = F.when(namespace == default, F.lit("")).otherwise(
        F.concat(namespace, F.lit("/"))
    )
    return F.concat(prefix, job_id, F.lit("."), task_id)
