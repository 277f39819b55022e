from cassandra_data_migrator_ray.cli import main

raise SystemExit(main())
