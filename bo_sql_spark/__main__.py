from bo_sql_spark.engine import main

raise SystemExit(main())
