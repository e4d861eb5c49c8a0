"""``python -m json_spark`` / spark-submit module entry."""

import sys

from .cli import main

sys.exit(main())
