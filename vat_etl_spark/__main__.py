from vat_etl_spark.app import main

main()
