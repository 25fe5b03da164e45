-- Staging passthrough view over the menu source
-- (reference dbt/models/staging/raw_pos_menu.sql:1-2).
SELECT *
FROM {{ source('tb_101', 'menu') }}
