from pleiades_spark.cli import main

raise SystemExit(main())
