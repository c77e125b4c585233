"""``python -m rag_vector_database_spark`` — the CLI entry point."""

import sys

from .cli import main

sys.exit(main())
