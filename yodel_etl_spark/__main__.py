"""``python -m yodel_etl_spark <parks|convert|chat-qa|qa-eval> ...``"""

import sys

from yodel_etl_spark.cli import main

sys.exit(main())
