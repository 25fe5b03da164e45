-- Staging passthrough view over the customer_loyalty source
-- (reference dbt/models/staging/raw_customer_customer_loyalty.sql:1-2).
SELECT *
FROM {{ source('tb_101', 'customer_loyalty') }}
