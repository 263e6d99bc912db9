from circus_train_spark.cli import main

raise SystemExit(main())
