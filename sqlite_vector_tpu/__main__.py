from sqlite_vector_tpu.cli import main

raise SystemExit(main())
