-- Staging passthrough view over the country source
-- (reference dbt/models/staging/raw_pos_country.sql:1-2).
SELECT *
FROM {{ source('tb_101', 'country') }}
